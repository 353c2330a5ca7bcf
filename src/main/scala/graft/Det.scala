package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic rounding helpers for the DuckDB-oracle gate.
  *
  * `round()` on a DOUBLE is NOT portable across engines: Spark rounds the
  * shortest decimal representation (BigDecimal.valueOf) with HALF_UP,
  * DuckDB rounds the binary value — for results near a .005 boundary they
  * disagree by one cent. `floor(x * 10^n + 0.5) / 10^n` is pure IEEE
  * arithmetic, so given bit-identical inputs both engines produce
  * bit-identical outputs. Exact-DECIMAL values should instead be rounded
  * while still decimal (both engines round exact decimals half-away-from-
  * zero) and only then cast to double.
  *
  * SQL-side equivalents (DuckDB): `floor((x) * 100 + 0.5) / 100`, etc.
  */
object Det {
  /** Bit-deterministic 2-decimal rounding of a double expression. */
  def r2(c: Column): Column = floor(c * 100 + 0.5) / 100
  /** Bit-deterministic 4-decimal rounding of a double expression. */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
}
