package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Tests for the extended LLM-pipeline operators (LlmOpsExt/MultimodalOps)
  * that the DuckDB oracle cannot gate. */
class LlmExtSpecs extends SparkTestBase {

  test("dedup_simhash: injected near-dups found with small hamming distance") {
    val pairs = LlmOpsExt.dedupSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val lowest = graft.Tables.t(spark, sfDir, "documents")
      .orderBy(col("doc_id").asc).limit(3).collect().map(_.getAs[Long]("doc_id"))
    lowest.foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000000L)
      assert(hit.isDefined, s"simhash missed near-dup of doc $id")
      assert(hit.get._3 <= 8, s"hamming ${hit.get._3} > 8 for doc $id")
    }
  }

  test("simhash is invariant to token order but sensitive to token change") {
    import spark.implicits._
    val sigs = Seq("alpha beta gamma delta", "delta gamma beta alpha", "alpha beta gamma epsilon")
      .toDF("text").select(LlmOpsExt.simhashUdf(col("text")).as("sig"))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1)) // bag-of-words: order-invariant
    assert(sigs(0) != sigs(2))
  }

  test("sim_ann: scaled near-duplicate always collides and ranks first") {
    import spark.implicits._
    // a vector and its positive scaling share every hyperplane sign ->
    // identical signature -> guaranteed bucket collision
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding"))
      .as[Seq[Float]].head()
    val scaled = emb.map(x => x * 1.001f)
    val s1 = Seq(emb).toDF("embedding").select(LlmOpsExt.annSigUdf(col("embedding"))).head().getInt(0)
    val s2 = Seq(scaled).toDF("embedding").select(LlmOpsExt.annSigUdf(col("embedding"))).head().getInt(0)
    assert(s1 == s2)
    // and the ANN query itself returns exactly <=5 ranked rows per probe
    val ann = LlmOpsExt.simAnn(spark, sfDir)
    val perProbe = ann.groupBy(col("p_id")).agg(count(lit(1)).as("n"), max(col("rnk")).as("m"))
      .collect()
    assert(perProbe.nonEmpty)
    perProbe.foreach(r => assert(r.getAs[Long]("n") <= 5 && r.getAs[Int]("m") <= 5))
  }

  test("sim_ann candidates agree with exact cosine where they overlap") {
    // every (probe, candidate, cosine) ANN returns must equal the exact
    // cosine sim_topk computes for the same pair
    val ann = LlmOpsExt.simAnn(spark, sfDir)
      .select(col("p_id"), col("c_id"), col("cosine")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = LlmOps.simTopk(spark, sfDir)
      .select(col("q_id"), col("c_id"), col("cosine")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val overlap = ann.keySet intersect exact.keySet
    assert(overlap.nonEmpty, "ANN found none of the exact top-5 pairs")
    overlap.foreach(k => assert(math.abs(ann(k) - exact(k)) < 1e-9))
  }

  test("sim_ann_ivf: cell search returns exact cosines; bounded per-probe output") {
    val ivf = LlmOpsExt.simAnnIvf(spark, sfDir)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rnk")).collect()
    assert(ivf.nonEmpty)
    val exact = LlmOps.simTopk(spark, sfDir)
      .select(col("q_id"), col("c_id"), col("cosine")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivfMap = ivf.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // any pair the cell search surfaces must carry the exact cosine
    val overlap = ivfMap.keySet intersect exact.keySet
    assert(overlap.nonEmpty, "IVF surfaced none of the exact top-5 pairs")
    overlap.foreach(k => assert(math.abs(ivfMap(k) - exact(k)) < 1e-9))
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) => assert(rs.length <= 5) }
  }

  test("text_lang_id: marker-based heuristic identifies crafted sentences") {
    import spark.implicits._
    val got = Seq(
      ("das ist der hund und die katze", "de"),
      ("the cat and the dog is in town", "en"),
      ("el perro y la casa es de madera", "es"),
      ("le chien et le chat est un ami", "fr"),
      ("你好世界这是中文文本", "zh"),
      ("xyzzy plugh quux", "und"))
      .toDF("text", "expected")
      .select(LlmOpsExt.langIdUdf(col("text")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"predicted ${r.getString(0)}, expected ${r.getString(1)}"))
  }

  test("multimodal_decode: deterministic schema + stable values across runs") {
    val a = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    val b = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    assert(a.nonEmpty && a.sameElements(b))
    a.foreach { r =>
      assert(r.getAs[Int]("resized_w") <= 128 && r.getAs[Int]("resized_h") <= 128)
      assert(r.getAs[Int]("n_sampled") >= 1)
      assert(r.getAs[Int]("n_bytes") > 0)
    }
  }
}
