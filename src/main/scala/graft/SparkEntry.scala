package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{ScalarFns, UdxOps}
import graft.operators.{Aggregates, CorpusOps, CurationOps, EmbeddingOps, Joins, LlmOps, LlmOpsExt, MultimodalOps, QualityOps, RelationalOps, ScaleJoins, TableFormat, TimeSeriesOps, Windows}
import graft.sources.{GraftCatalogOps, PcapOps}
import graft.streaming.StreamOps

/** Driver contract (SURVEY.md §7): the full declared operator surface of
  * the engine, one named entry per SURVEY.md §2.B row, with DuckDB oracle
  * SQL wherever the semantics are SQL-expressible (determinism rule:
  * total-order ORDER BY, rounded doubles, explicit NULLS FIRST/LAST). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — proves read → shuffle agg → sort end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ ScalarFns.queries ++ UdxOps.queries ++
      PcapOps.queries ++ LlmOps.queries ++ LlmOpsExt.queries ++
      MultimodalOps.queries ++ ScaleJoins.queries ++ StreamOps.queries ++
      TimeSeriesOps.queries ++ EmbeddingOps.queries ++ CorpusOps.queries ++
      CurationOps.queries ++ QualityOps.queries ++ TableFormat.queries ++
      GraftCatalogOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops DuckDB can't reproduce
    * (pcap decode, HLL sketches, MinHash LSH) — those are pinned by
    * scalatests instead. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracle ++ Joins.oracle ++ Aggregates.oracle ++
      Windows.oracle ++ ScalarFns.oracle ++ UdxOps.oracle ++
      PcapOps.oracle ++ LlmOps.oracle ++ LlmOpsExt.oracle ++
      MultimodalOps.oracle ++ ScaleJoins.oracle ++ StreamOps.oracle ++
      TimeSeriesOps.oracle ++ EmbeddingOps.oracle ++ CorpusOps.oracle ++
      CurationOps.oracle ++ QualityOps.oracle ++ TableFormat.oracle ++
      GraftCatalogOps.oracle
}
