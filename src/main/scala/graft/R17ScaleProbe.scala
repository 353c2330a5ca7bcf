package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Scale probe for the r17 paths with no bench slope of their own —
  * run at two data multipliers (×1 / ×10 over the corpus `documents`)
  * and compare:
  *
  *  - DICT DISTINCT (`mv_distinct_str` machinery): create cost follows
  *    rows + distinct keys (expected ~M×); a FIXED-SIZE append+refresh
  *    must stay FLAT (delta-shaped — the dict covers only the span's
  *    new keys); the rewrite's serve reads |groups| rows (flat).
  *  - LEFT OUTER MV (`mv_outer` machinery): create ∝ rows; a 1-key
  *    presence FLIP refresh costs the affected-key fact rows (grows
  *    with that key's selectivity share, NEVER a full recompute — the
  *    probe reports flip vs create so the gap is visible); a
  *    fixed-size fact append refresh stays flat.
  *  - VAR REWRITE (`mv_rewrite_var` machinery): the served global
  *    variance reads |groups| state rows — flat at any M.
  *
  * Usage: R17ScaleProbe <sfDir> <mult>  → one JSON line. */
object R17ScaleProbe {
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
    for (t <- Seq("p17_src", "p17_dict", "p17_dict__state",
                  "p17_dict__state__dict_d_u", "p17_outer_f", "p17_outer_d",
                  "p17_outer", "p17_outer__state", "p17_var", "p17_var__state"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$wh/db/$t"), true)
    val docs0 = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val one = docs0.count()
    // M-scaled fact: clones shift doc_id, and the dict key re-derives
    // as source_<doc_id mod rows/5> so the DISTINCT-KEY count scales
    // with the data too (~rows/5 keys — the hard case for the dict)
    val n = one * mult
    val fact = (0 until mult).map { m =>
      docs0.withColumn("doc_id", col("doc_id") + lit(m.toLong * 10L * one))
    }.reduce(_ unionByName _)
      .withColumn("source",
        concat(col("source"), lit("_"),
          pmod(xxhash64(col("doc_id")), lit(math.max(1L, n / 5L)))
            .cast("string")))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // ---- DICT DISTINCT ----
    TableFormat.commit(spark, s"$wh/db/p17_src",
      fact.select(col("doc_id"), col("lang"), col("source").as("u")),
      1, parent = None, statsCol = Some("doc_id"))
    spark.conf.set("spark.graft.mv.distinct.dict", "true")
    val (_, dictCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p17_dict',
        |  'SELECT lang, count(*) AS n_docs, count(DISTINCT u) AS d_u
        |   FROM graft.db.p17_src GROUP BY lang')""".stripMargin).collect())
    val kDict = TableFormat.readSnapshot(spark,
      s"$wh/db/p17_dict__state__dict_d_u").count()
    // fixed-size append: 500 rows, 50 of them NEW dict keys
    TableFormat.appendCommit(spark, s"$wh/db/p17_src",
      spark.range(500).select(
        (col("id") + lit(100L * one * mult)).as("doc_id"),
        lit("zz").as("lang"),
        concat(lit("fresh_"), (col("id") % 50).cast("string")).as("u")),
      statsCol = Some("doc_id"))
    val (_, dictRefresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p17_dict')").collect())
    spark.conf.set("spark.graft.mv.rewrite", "true")
    val (dServed, dictServe) = timed(spark.sql(
      "SELECT count(DISTINCT u) FROM graft.db.p17_src").head.getLong(0))
    spark.conf.set("spark.graft.mv.rewrite", "false")
    spark.conf.unset("spark.graft.mv.distinct.dict")
    // ---- LEFT OUTER MV ----
    TableFormat.commit(spark, s"$wh/db/p17_outer_f",
      fact.select(col("doc_id"), col("lang"), col("n_chars")),
      1, parent = None, statsCol = Some("doc_id"))
    TableFormat.commit(spark, s"$wh/db/p17_outer_d",
      docs0.select(col("lang")).distinct().filter("lang <> 'de'")
        .withColumn("region", concat(lit("R_"), upper(col("lang")))),
      1, parent = None)
    val (_, outerCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p17_outer',
        |  'SELECT region, count(*) AS n_docs, sum(n_chars) AS s
        |   FROM graft.db.p17_outer_f f LEFT JOIN graft.db.p17_outer_d d
        |     ON f.lang = d.lang GROUP BY region')""".stripMargin).collect())
    // 1-key presence flip: 'de' arrives — correction ∝ de's fact rows
    TableFormat.appendCommit(spark, s"$wh/db/p17_outer_d",
      spark.sql("SELECT 'de' AS lang, 'R_DE' AS region"))
    val (_, flipRefresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p17_outer')").collect())
    // fixed-size fact append (no flips): must be flat
    TableFormat.appendCommit(spark, s"$wh/db/p17_outer_f",
      spark.range(500).select(
        (col("id") + lit(200L * one * mult)).as("doc_id"),
        lit("en").as("lang"), (col("id") % 97).as("n_chars")),
      statsCol = Some("doc_id"))
    val (_, outerRefresh) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p17_outer')").collect())
    // ---- VAR REWRITE serve ----
    val (_, varCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p17_var',
        |  'SELECT lang, count(*) AS n_docs, var_samp(n_chars) AS v
        |   FROM graft.db.p17_outer_f GROUP BY lang')""".stripMargin).collect())
    spark.conf.set("spark.graft.mv.rewrite", "true")
    val (vServed, varServe) = timed {
      val df = spark.sql("SELECT var_samp(n_chars) FROM graft.db.p17_outer_f")
      require(df.queryExecution.optimizedPlan.toString.contains("p17_var__state"),
        "var rollup must serve from state")
      df.head.getDouble(0)
    }
    spark.conf.set("spark.graft.mv.rewrite", "false")
    println(f"""{"probe":"r17_scale","mult":$mult,"rows":$n,"dict_keys":$kDict,"dict_create_s":$dictCreate%.3f,"dict_refresh_s":$dictRefresh%.3f,"dict_serve_s":$dictServe%.3f,"dict_served":$dServed,"outer_create_s":$outerCreate%.3f,"flip_refresh_s":$flipRefresh%.3f,"outer_refresh_s":$outerRefresh%.3f,"var_create_s":$varCreate%.3f,"var_serve_s":$varServe%.3f,"var_served":$vServed%.6f}""")
    spark.stop()
  }
}
