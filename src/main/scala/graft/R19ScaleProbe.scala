package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Scale probe for the r19 paths with no bench slope of their own —
  * run at data multipliers (×1 / ×10 / ×50 over the corpus
  * `documents`) and compare:
  *
  *  - FILTER-CLAUSE / CASE-spelling serving (`mv_rewrite_filter`
  *    machinery): the PIVOT query reads |groups| state rows with the
  *    remapped predicate attached to each re-aggregation — the corpus
  *    never appears in the plan, so serve time must stay FLAT.
  *  - OPT-IN approx_percentile serving (approxFamily flag): exact-dim
  *    probe and global roll-up both read |groups| stored sketches —
  *    FLAT.
  *  - SKETCH × OUTER-CHAIN flip regroup: a 1-key presence flip at the
  *    outer hop regroups the SURVIVING touched groups' rows at the
  *    pinned version vector — cost follows the touched groups' row
  *    SHARE of the corpus (linear in that share, never a full chain
  *    recompute; reported beside create so the gap is visible).
  *
  * Usage: R19ScaleProbe <sfDir> <mult>  → one JSON line. */
object R19ScaleProbe {
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
    for (t <- Seq("p19_f", "p19_fc", "p19_fc__state", "p19_ap", "p19_ap__state",
                  "p19_cf", "p19_cd1", "p19_cd2", "p19_chs", "p19_chs__state"))
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
    // ---- FILTER-clause / CASE serving over a (lang, source) MV ----
    TableFormat.commit(spark, s"$wh/db/p19_f", fact, 1, parent = None,
      statsCol = Some("doc_id"))
    val (_, fcCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p19_fc',
        |  'SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS s,
        |          avg(n_chars) AS a
        |   FROM graft.db.p19_f GROUP BY lang, source')""".stripMargin).collect())
    spark.conf.set("spark.graft.mv.rewrite", "true")
    def fcQuery() = {
      val df = spark.sql(
        """SELECT lang,
          |  count(*) FILTER (WHERE source = 'src7') AS n7,
          |  sum(n_chars) FILTER (WHERE source = 'src7') AS s7,
          |  avg(CASE WHEN source = 'src3' THEN n_chars END) AS a3,
          |  count_if(source = 'src5') AS c5
          |FROM graft.db.p19_f GROUP BY lang""".stripMargin)
      require(df.queryExecution.optimizedPlan.toString.contains("p19_fc__state"),
        "FILTER-clause aggregates must serve from state")
      df.collect().length
    }
    val (fcRows, fcServe) = timed(fcQuery())
    // steady-state repeat: the first serve pays analysis + codegen +
    // relation-cache warmup; the repeat is the per-dashboard-refresh
    // cost the flatness claim is about
    val (_, fcServe2) = timed(fcQuery())
    spark.conf.set("spark.graft.mv.rewrite", "false")
    // ---- opt-in approx_percentile serving from KLL state ----
    val (_, apCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p19_ap',
        |  'SELECT lang, count(*) AS n_docs, approx_pct(n_chars, 0.5) AS p50
        |   FROM graft.db.p19_f GROUP BY lang')""".stripMargin).collect())
    spark.conf.set("spark.graft.mv.rewrite", "true")
    spark.conf.set("spark.graft.mv.rewrite.approxFamily", "true")
    def apQuery() = {
      val df = spark.sql(
        """SELECT lang, approx_percentile(n_chars, 0.9) AS p90
          |FROM graft.db.p19_f GROUP BY lang""".stripMargin)
      require(df.queryExecution.optimizedPlan.toString.contains("p19_ap__state"),
        "flag-on approx_percentile must serve from state")
      df.collect().length
    }
    val (apRows, apServe) = timed(apQuery())
    val (_, apServe2) = timed(apQuery())
    val (_, apRollup) = timed {
      val df = spark.sql(
        "SELECT approx_percentile(n_chars, 0.5) FROM graft.db.p19_f")
      require(df.queryExecution.optimizedPlan.toString.contains("p19_ap__state"),
        "global approx_percentile roll-up must serve from state")
      df.collect().length
    }
    spark.conf.unset("spark.graft.mv.rewrite.approxFamily")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    // ---- sketch × outer-chain flip regroup ----
    // fact ⋈ d1(lang→region) ⟕ d2(region→zone); zones built so the
    // NULL-zone group holds TWO regions' rows — the 1-key flip drains
    // one and the surviving group's sketch must regroup
    TableFormat.commit(spark, s"$wh/db/p19_cf", fact, 1, parent = None,
      statsCol = Some("doc_id"))
    TableFormat.commit(spark, s"$wh/db/p19_cd1",
      docs0.select(col("lang")).distinct()
        .withColumn("region", concat(lit("R_"), upper(col("lang")))),
      1, parent = None)
    TableFormat.commit(spark, s"$wh/db/p19_cd2",
      docs0.select(col("lang")).distinct().filter("lang = 'en'")
        .select(concat(lit("R_"), upper(col("lang"))).as("region"))
        .withColumn("zone", concat(lit("Z_"), col("region"))),
      1, parent = None)
    val (_, chsCreate) = timed(spark.sql(
      """CALL graft.system.create_mv('db.p19_chs',
        |  'SELECT zone, count(*) AS n_docs, approx_pct(n_chars, 0.5) AS p50
        |   FROM graft.db.p19_cf f
        |     JOIN graft.db.p19_cd1 d1 ON f.lang = d1.lang
        |     LEFT JOIN graft.db.p19_cd2 d2 ON d1.region = d2.region
        |   GROUP BY zone')""".stripMargin).collect())
    // 1-key 0→1 flip at the outer hop: R_FR gains a zone; the fr rows
    // leave the NULL-zone group, which survives on every other lang
    TableFormat.appendCommit(spark, s"$wh/db/p19_cd2",
      spark.sql("SELECT 'R_FR' AS region, 'Z_R_FR' AS zone"))
    val (_, chsFlip) = timed(
      spark.sql("CALL graft.system.refresh_mv('db.p19_chs')").collect())
    println(f"""{"probe":"r19_scale","mult":$mult,"rows":$n,"fc_create_s":$fcCreate%.3f,"fc_serve_s":$fcServe%.3f,"fc_serve2_s":$fcServe2%.3f,"fc_rows":$fcRows,"ap_create_s":$apCreate%.3f,"ap_serve_s":$apServe%.3f,"ap_serve2_s":$apServe2%.3f,"ap_rollup_s":$apRollup%.3f,"ap_rows":$apRows,"chs_create_s":$chsCreate%.3f,"chs_flip_regroup_s":$chsFlip%.3f}""")
    spark.stop()
  }
}
