package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Scale probe for the r18 paths with no bench slope of their own —
  * run at two data multipliers (×1 / ×10 over the corpus `documents`)
  * and compare:
  *
  *  - KLL MV (`mv_approx_pct` machinery): create ∝ rows (one sketch
  *    build pass); a FIXED-SIZE append+refresh must stay FLAT (the
  *    delta sketch covers only the span's rows and merges per group);
  *    the any-rank serve reads |groups| state rows — flat; the global
  *    roll-up merges |groups| sketches — flat.
  *  - N-CHAIN OUTER MV (`fact ⟕ dim1 ⟕ dim2` machinery): create ∝
  *    rows; a 1-key HOP-2 presence flip costs the flipped key's
  *    prefix rows (share-bound, never a recompute — reported against
  *    create so the gap is visible); a fixed-size fact append threads
  *    the chain once — flat in the fact size.
  *  - GROUPING SETS serve (`mv_rewrite_gsets` machinery): the
  *    three-grain query reads |groups| × |sets| Expand rows — flat.
  *
  * Usage: R18ScaleProbe <sfDir> <mult>  → one JSON line. */
object R18ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"${Tables.scratchDir}/graft_wh"
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("p18_f", "p18_d1", "p18_d2", "p18_kll", "p18_kll__state",
                  "p18_chain", "p18_chain__state", "p18_gs", "p18_gsmv", "p18_gsmv__state"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$wh/db/$t"), true)
    val docs0 = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val one = docs0.count()
    val n = one * mult
    val fact = (0 until mult).map { m =>
      docs0.withColumn("doc_id", col("doc_id") + lit(m.toLong * 10L * one))
    }.reduce(_ unionByName _)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // ---- KLL quantile MV ----
    TableFormat.commit(spark, s"$wh/db/p18_f",
      fact.select(col("doc_id"), col("lang"), col("n_chars")),
      1, parent = None, statsCol = Some("doc_id"))
    val (_, kllCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p18_kll',
        |  'SELECT lang, count(*) AS n_docs, approx_pct(n_chars, 0.5) AS p50
        |   FROM graft.db.p18_f GROUP BY lang')""".stripMargin).collect())
    // fixed-size append: the delta sketch is span-shaped, merge per group
    TableFormat.appendCommit(spark, s"$wh/db/p18_f",
      spark.range(500).select(
        (col("id") + lit(100L * one * mult)).as("doc_id"),
        lit("en").as("lang"), (col("id") % 97).as("n_chars")),
      statsCol = Some("doc_id"))
    val (_, kllRefresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p18_kll')").collect())
    spark.conf.set("spark.graft.mv.rewrite", "true")
    val (p90Served, kllServe) = timed {
      val df = spark.sql(
        """SELECT lang, kll_quantile(kll_agg(n_chars), 0.9D) AS p90
          |FROM graft.db.p18_f GROUP BY lang""".stripMargin)
      require(df.queryExecution.optimizedPlan.toString.contains("p18_kll__state"),
        "any-rank quantile must serve from state")
      df.collect().length
    }
    val (_, kllRollup) = timed {
      val df = spark.sql(
        "SELECT kll_quantile(kll_agg(n_chars), 0.5D) FROM graft.db.p18_f")
      require(df.queryExecution.optimizedPlan.toString.contains("p18_kll__state"),
        "global quantile roll-up must serve from state")
      df.head.getDouble(0)
    }
    spark.conf.set("spark.graft.mv.rewrite", "false")
    // ---- N-CHAIN OUTER MV: fact ⟕ d1(lang→region) ⟕ d2(region→zone) ----
    TableFormat.commit(spark, s"$wh/db/p18_d1",
      docs0.select(col("lang")).distinct().filter("lang <> 'de'")
        .withColumn("region", concat(lit("R_"), upper(col("lang")))),
      1, parent = None)
    TableFormat.commit(spark, s"$wh/db/p18_d2",
      docs0.select(col("lang")).distinct().filter("lang IN ('en','fr')")
        .select(concat(lit("R_"), upper(col("lang"))).as("region"))
        .withColumn("zone", concat(lit("Z_"), col("region"))),
      1, parent = None)
    val (_, chainCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p18_chain',
        |  'SELECT zone, count(*) AS n_docs, sum(n_chars) AS s
        |   FROM graft.db.p18_f f
        |     LEFT JOIN graft.db.p18_d1 d1 ON f.lang = d1.lang
        |     LEFT JOIN graft.db.p18_d2 d2 ON d1.region = d2.region
        |   GROUP BY zone')""".stripMargin).collect())
    // 1-key HOP-2 flip: region R_ES gains a zone — correction ∝ the
    // es-share of prefix rows, never a chain recompute
    TableFormat.appendCommit(spark, s"$wh/db/p18_d2",
      spark.sql("SELECT 'R_ES' AS region, 'Z_R_ES' AS zone"))
    val (_, flip2Refresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p18_chain')").collect())
    // 1-key HOP-1 flip: 'de' arrives in d1 (its region has no zone —
    // the cascade lands the rows back in the NULL zone)
    TableFormat.appendCommit(spark, s"$wh/db/p18_d1",
      spark.sql("SELECT 'de' AS lang, 'R_DE' AS region"))
    val (_, flip1Refresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p18_chain')").collect())
    // fixed-size fact append (no flips): one chain pass over 500 rows
    TableFormat.appendCommit(spark, s"$wh/db/p18_f",
      spark.range(500).select(
        (col("id") + lit(200L * one * mult)).as("doc_id"),
        lit("en").as("lang"), (col("id") % 89).as("n_chars")),
      statsCol = Some("doc_id"))
    val (_, chainRefresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p18_chain')").collect())
    // ---- GROUPING SETS serve ----
    TableFormat.commit(spark, s"$wh/db/p18_gs",
      fact.select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      1, parent = None, statsCol = Some("doc_id"))
    spark.sql(
      """CALL graft.system.create_mv('db.p18_gsmv',
        |  'SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS s
        |   FROM graft.db.p18_gs GROUP BY lang, source')""".stripMargin).collect()
    spark.conf.set("spark.graft.mv.rewrite", "true")
    val (gsRows, gsServe) = timed {
      val df = spark.sql(
        """SELECT lang, source, count(*) AS c, sum(n_chars) AS s
          |FROM graft.db.p18_gs
          |GROUP BY lang, source GROUPING SETS ((lang, source), (lang), ())""".stripMargin)
      require(df.queryExecution.optimizedPlan.toString.contains("p18_gsmv__state"),
        "grouping sets must serve from state")
      df.collect().length
    }
    spark.conf.set("spark.graft.mv.rewrite", "false")
    println(f"""{"probe":"r18_scale","mult":$mult,"rows":$n,"kll_create_s":$kllCreate%.3f,"kll_refresh_s":$kllRefresh%.3f,"kll_serve_s":$kllServe%.3f,"kll_rollup_s":$kllRollup%.3f,"kll_groups":$p90Served,"chain_create_s":$chainCreate%.3f,"flip2_refresh_s":$flip2Refresh%.3f,"flip1_refresh_s":$flip1Refresh%.3f,"chain_refresh_s":$chainRefresh%.3f,"gs_serve_s":$gsServe%.3f,"gs_rows":$gsRows}""")
    spark.stop()
  }
}
