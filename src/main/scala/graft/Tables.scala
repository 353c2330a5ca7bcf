package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver corpus (/root/repo/TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so plans are
  * rebuilt per SF and Catalyst sees real parquet statistics at each scale
  * (partition pruning / broadcast decisions are made per-SF, not frozen).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(new java.io.File(s"$dir/$name.parquet").exists(),
      s"table '$name' not found at $dir/$name.parquet (valid tables: ${names.mkString(", ")})")
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some corpus
      // generations and TIMESTAMP(MICROS, ntz) in others — normalize BOTH
      // to the same µs TimestampType so every downstream query sees one
      // type regardless of generation:
      //  - NANOS: Spark 4 refuses to read it natively
      //    (PARQUET_TYPE_ILLEGAL); read the raw int64 via nanosAsLong and
      //    convert with INTEGER division (a double-based division would
      //    lose precision above 2^53 ns ≈ 1970+104 days);
      //  - MICROS ntz: reads as TIMESTAMP_NTZ; the cast to TimestampType
      //    is value-preserving under the UTC session timezone every
      //    entrypoint pins.
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw // already µs TimestampType
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Memoized table row count. The dedup/ANN operators size their blocking
    * parameters (band bits, plane counts, IVF cells) from corpus
    * cardinality; memoizing makes that one count job per (dir, table) per
    * session instead of one full pass per query. On a real deployment this
    * is the catalog's rowCount statistic (ANALYZE TABLE) — the driver
    * corpus carries no stats, so the first call pays one count. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    rowCountCache.getOrElseUpdate((dir, name), t(spark, dir, name).count())

  /** Register every corpus table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Scratch dir for sink round-trips (PcapOps.sinkParquetZstd); kept
    * inside the repo per sandbox rules. Spark's writers create it. */
  val scratchDir = "/root/repo/target/tmp"
}
