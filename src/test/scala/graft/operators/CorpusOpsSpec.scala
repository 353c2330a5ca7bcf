package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.MisraGriesAgg

/** r5 surface: Misra–Gries sketch guarantees, DPP plan shape, and the
  * two-phase skew agg's equivalence to the direct plan. */
class CorpusOpsSpec extends SparkTestBase {

  test("misra_gries: every term with freq > n/(k+1) survives an adversarial ordering") {
    import spark.implicits._
    // skewed stream: 3 heavy terms (1200/900/600) drowned in 97 distinct
    // light terms x 30 — heavy sorted LAST so the sketch must evict light
    // counters to admit them (the hard direction for MG)
    val heavy = Seq.fill(1200)("hh_a") ++ Seq.fill(900)("hh_b") ++ Seq.fill(600)("hh_c")
    val light = (1 to 97).flatMap(i => Seq.fill(30)(f"light_$i%03d"))
    val stream = (light ++ heavy).toDF("term") // deterministic worst-ish order
    val k = 10
    val n = light.size + heavy.size
    val cands = stream.repartition(7) // force multi-partition partial+merge
      .agg(MisraGriesAgg.misra_gries(col("term"), k).as("c"))
      .collect()(0).getSeq[String](0).toSet
    assert(cands.size <= k, s"sketch exceeded k=$k: ${cands.size}")
    Seq("hh_a" -> 1200, "hh_b" -> 900, "hh_c" -> 600).foreach { case (t, f) =>
      assert(f > n / (k + 1), s"test setup broken: $t not above threshold")
      assert(cands.contains(t), s"guaranteed heavy hitter $t missing from $cands")
    }
  }

  test("misra_gries: serialize/deserialize roundtrips the counter map") {
    val agg = MisraGriesAgg(org.apache.spark.sql.graftbridge.SqlBridge.expression(col("x")), 5)
    val buf = agg.createAggregationBuffer()
    buf ++= Map("alpha" -> 3L, "beta" -> 1L, "γ-utf8" -> 7L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("misra_gries: registered for SQL via GraftExtensions function registry") {
    val (ident, info, builder) = MisraGriesAgg.functionDescription
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql(
      "SELECT misra_gries(t, 2) FROM VALUES ('a'),('a'),('a'),('b'),('c') AS v(t)")
      .collect()(0).getSeq[String](0)
    assert(r.contains("a"), s"majority element missing from $r")
    assert(r.size <= 2)
    // non-literal k must be a clear error, not a crash later
    val err = intercept[Exception] {
      spark.sql("SELECT misra_gries(t, length(t)) FROM VALUES ('a') AS v(t)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("agg_heavy_hitters: candidates recounted exactly match the direct GROUP BY") {
    val viaSketch = CorpusOps.aggHeavyHitters(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tok = graft.Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
    val total = tok.count()
    val direct = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 30 > total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSketch == direct, s"sketch path diverged: $viaSketch vs $direct")
    assert(direct.nonEmpty, "corpus produced no heavy hitters — threshold degenerate")
  }

  test("gram_md5_keys kernel is bit-identical to the HOF md5/slice chain") {
    import org.apache.spark.sql.functions.expr
    val hof = expr(
      "transform(sequence(1, greatest(size(split(text, ' ')) - 7, 0)), " +
        "i -> md5(concat_ws(' ', slice(split(text, ' '), i, 8))))")
    val rows = graft.Tables.t(spark, sfDir, "documents")
      .select(graft.functions.HashKernels.gram_md5_keys(col("text"), 8).as("kern"), hof.as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel diverged from HOF: ${r.getSeq[String](0).take(2)} vs ${r.getSeq[String](1).take(2)}")
    }
  }

  test("chunk_md5_keys kernel is bit-identical to the strided HOF chain") {
    import org.apache.spark.sql.functions.expr
    // sequence(1, 0) DESCENDS in Spark, so short docs need the explicit
    // empty-array branch rather than a greatest() clamp
    val hof = expr(
      "CASE WHEN size(split(text, ' ')) >= 16 THEN " +
        "transform(sequence(1, size(split(text, ' ')) div 16), " +
        "i -> md5(concat_ws(' ', slice(split(text, ' '), (i - 1) * 16 + 1, 16)))) " +
        "ELSE array() END")
    val rows = graft.Tables.t(spark, sfDir, "documents")
      .select(graft.functions.HashKernels.chunk_md5_keys(col("text"), 16).as("kern"), hof.as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"chunk kernel diverged from HOF: ${r.getSeq[String](0).take(2)} vs ${r.getSeq[String](1).take(2)}")
    }
  }

  test("join_dpp: physical plan carries a dynamicpruning subquery on the fact scan") {
    val df = ScaleJoins.joinDpp(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in the fact scan:\n$plan")
    assert(df.count() >= 1)
  }

  test("agg_skew_twophase: salted two-phase equals the direct aggregation") {
    val two = Aggregates.aggSkewTwophase(spark, sfDir).collect().map(_.toSeq)
    val direct = graft.Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity").cast("decimal(18,2)")), 2).cast("double").as("sum_qty"),
           round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double").as("sum_price"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc)
      .collect().map(_.toSeq)
    assert(two.toSeq == direct.toSeq)
  }

  test("dedup_substring: keeper keeps everything, copies lose the span, full excision goes null") {
    import spark.implicits._
    val span = (0 until 8).map(i => s"dup$i").mkString(" ") // one exact 8-gram
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),      // keeper (lowest id)
      (2L, s"other words $span trailing here"),   // loses the 8 span tokens
      (3L, span),                                  // ONLY the span -> fully excised
      (4L, "nothing shared with anyone here at all today ok")) // untouched
      .toDF("doc_id", "text")
    val out = CorpusOps.dedupSubstringOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4))))).toMap
    // doc 1 is the keeper: nothing removed, md5 = md5(original text)
    assert(out(1L) == ((12L, 12L, 0L,
      Some(java.security.MessageDigest.getInstance("MD5")
        .digest(s"alpha beta $span gamma delta".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))))
    // doc 2 loses exactly the 8 covered positions, scrubbed text reassembles
    assert(out(2L)._1 == 12L && out(2L)._2 == 4L && out(2L)._3 == 8L)
    assert(out(2L)._4.contains(java.security.MessageDigest.getInstance("MD5")
      .digest("other words trailing here".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString))
    // doc 3 is the span alone: fully excised -> zero kept, NULL fingerprint
    assert(out(3L) == ((8L, 0L, 8L, None)))
    // doc 4 untouched
    assert(out(4L)._3 == 0L)
  }
}
