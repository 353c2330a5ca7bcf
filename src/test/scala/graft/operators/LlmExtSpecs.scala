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
      .toDF("text").select(graft.functions.HashKernels.simhash_bands(col("text"), 4, 16).as("sigs"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1)) // bag-of-words: order-invariant
    assert(sigs(0) != sigs(2))
  }

  test("simhash band width grows with corpus size; wide bands keep band-collision recall") {
    import spark.implicits._
    // default sizing: classic 64-bit layout for small corpora, wider beyond
    assert(LlmOpsExt.simhashBandBits(500) == 16)
    assert(LlmOpsExt.simhashBandBits(100000000L) ==
      math.ceil(math.log(100000000.0 / 16) / math.log(2)).toInt)
    // a near-dup pair still shares bands at a 22-bit width (wider slices
    // are *harder* to match exactly, so verify recall survives widening).
    // The doc must be long enough that one added token flips few signature
    // bits — a one-token edit of an 8-token doc is NOT a simhash near-dup.
    val base = (0 until 200).map(i => s"tok$i").mkString(" ")
    val pairs = LlmOpsExt.dedupSimhashOn(
      Seq((1L, base), (2L, base + " mutated"),
          (3L, "totally different words nothing shared here at all"))
        .toDF("doc_id", "text"),
      bands = 4, bandBits = 22, maxBucket = 64).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    assert(!pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 3L)))
  }

  test("dedup hot-bucket cap: a 1000-copy document cannot blow up pair expansion") {
    import spark.implicits._
    // 1000 identical docs -> every one of their LSH buckets holds 1000 ids;
    // uncapped that is ~500k pairs per band into one reducer. The cap drops
    // those buckets (identical docs are dedup_exact's job) while the
    // genuine near-dup pair in ordinary buckets is still found.
    val hot = (0 until 1000).map(i => (5000L + i, "same boilerplate text " * 5))
    val normal = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mutated"),
      (3L, "unrelated content entirely about something else altogether now"))
    val out = LlmOps.dedupFuzzyOn((hot ++ normal).toDF("doc_id", "text"), maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)), "genuine near-dup lost")
    assert(!out.exists { case (a, b) => a >= 5000L && b >= 5000L },
      "hot-bucket pairs leaked through the cap")
  }

  test("sim_ann: scaled near-duplicate always collides and ranks first") {
    import spark.implicits._
    // a vector and its positive scaling share every hyperplane sign ->
    // identical signature -> guaranteed bucket collision
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding"))
      .as[Seq[Float]].head()
    val scaled = emb.map(x => x * 1.001f)
    def sigCol = graft.functions.HashKernels.ann_band_sigs(col("embedding"), 4, 4)
    val s1 = Seq(emb).toDF("embedding").select(sigCol).head().getSeq[Long](0)
    val s2 = Seq(scaled).toDF("embedding").select(sigCol).head().getSeq[Long](0)
    assert(s1 == s2)
    // and the ANN query itself returns exactly <=5 ranked rows per probe
    val ann = LlmOpsExt.simAnn(spark, sfDir)
    val perProbe = ann.groupBy(col("p_id")).agg(count(lit(1)).as("n"), max(col("rnk")).as("m"))
      .collect()
    assert(perProbe.nonEmpty)
    perProbe.foreach(r => assert(r.getAs[Long]("n") <= 5 && r.getAs[Int]("m") <= 5))
  }

  test("sim_ann blocking: per-probe candidate set stays bounded as the corpus grows") {
    // The 100 TB claim: default plane sizing (annPlanesPerBand) keeps the
    // expected bucket occupancy ~constant, so candidates per probe must NOT
    // grow linearly with corpus size. sf0.001 has 500 vectors (w=4),
    // sf0.1 has 2000 (w=6): corpus x4, candidate mean must stay within 2x
    // and under an absolute bound.
    def meanCandidates(dir: String): Double = {
      val emb = graft.Tables.t(spark, dir, "embeddings")
      val w = LlmOpsExt.annPlanesPerBand(emb.count())
      val rows = LlmOpsExt.annCandidatesPerProbe(emb, w).collect()
      rows.map(_.getAs[Long]("n_candidates")).sum.toDouble / math.max(rows.length, 1)
    }
    val small = meanCandidates("/root/testdata/sf0.001")
    val large = meanCandidates("/root/testdata/sf0.1")
    assert(small > 0, "blocking returned no candidates at sf0.001")
    assert(large <= small * 2.5,
      s"candidates grew with corpus size: $small -> $large (corpus grew 4x)")
    assert(large <= 4.0 * 4 * 32, // bands * AnnTargetBucket * slack
      s"mean candidate set $large exceeds the occupancy bound")
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

  test("IVF codebook round-trips through its parquet artifact bit-exactly") {
    // the "train once, broadcast forever" claim requires the ARTIFACT, not
    // the training run, to be the unit of reuse: persist → reload must give
    // byte-identical centroids, hence identical cell assignments
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val cells = 16
    val trained = LlmOpsExt.trainIvfCodebook(emb, cells)
    val path = s"${graft.Tables.scratchDir}/ivf_codebook_spec"
    LlmOpsExt.writeCodebook(spark, path, trained)
    val reloaded = LlmOpsExt.readCodebook(spark, path)
    assert(reloaded.length == trained.length)
    trained.zip(reloaded).foreach { case ((idA, cA), (idB, cB)) =>
      assert(idA == idB && cA.sameElements(cB), s"centroid $idA drifted through the artifact")
    }
    // assignments from the reloaded codebook equal assignments from the
    // trained one (same flattened plan constant → same kernel output)
    def assign(cb: Array[(Int, Array[Double])]) = {
      val flat = cb.flatMap(_._2)
      emb.select(col("vec_id"),
          graft.functions.HashKernels.ivf_top_cells(col("embedding"), flat, cb.head._2.length, 1).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).head).toMap
    }
    assert(assign(trained) == assign(reloaded))
  }

  test("IVF training sample is budget-bounded as the corpus grows (r9)") {
    import LlmOpsExt.{ivfSampleSize, IvfSampleBudget, ivfCellCount}
    // small corpora keep the 8-per-cell behavior unchanged
    assert(ivfSampleSize(22) == 176L)
    // at scale the sample pins to the BUDGET, not cells*8
    assert(ivfSampleSize(10000) == IvfSampleBudget.toLong)
    // degenerate huge-cell case: never below one point per centroid
    assert(ivfSampleSize(1 << 20) == (1 << 20).toLong)
    // corpus growth 10^9 → 10^12: driver sample never exceeds
    // max(codebook size, budget) — the pre-r9 cells*8 did (8× the codebook)
    Seq(1e9, 1e10, 1e11, 1e12).foreach { n =>
      val cells = ivfCellCount(n.toLong)
      assert(ivfSampleSize(cells) <= math.max(cells.toLong, IvfSampleBudget.toLong))
    }
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

  // multimodal_decode pins moved to MultimodalSpec (real BMP/WAV codec
  // goldens + end-to-end determinism).

  test("label propagation: diameter-30 chain converges (periodic localCheckpoint truncates lineage)") {
    import spark.implicits._
    // a 31-node path graph — worst case for min-label propagation: the
    // label crosses one hop per round, so this needs ~30 rounds and
    // exercises the every-5th-round lineage checkpoint repeatedly; plus a
    // disjoint 3-clique that must keep its own label
    val chain = (0L until 30L).map(i => (i + 1000L, i + 1001L))
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val labels = LlmOpsExt.propagateMinLabels(
      (chain ++ clique).toDF("s", "t"), maxIters = 40).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1000L to 1030L).foreach(n => assert(labels(n) == 1000L,
      s"chain node $n got label ${labels(n)}"))
    (1L to 3L).foreach(n => assert(labels(n) == 1L))
    assert(labels.size == 34)
  }

  test("label propagation: exceeding the iteration cap throws, never returns partial labels") {
    import spark.implicits._
    val chain = (0L until 12L).map(i => (i, i + 1)) // diameter 12 > cap 5
    val e = intercept[IllegalStateException] {
      LlmOpsExt.propagateMinLabels(chain.toDF("s", "t"), maxIters = 5).collect()
    }
    assert(e.getMessage.contains("did not reach its fixpoint"))
  }

  test("sim_ann_pq: re-ranked cosines are exact; recall vs the exact scan; determinism") {
    val pq = LlmOpsExt.simAnnPq(spark, sfDir)
      .select(col("p_id"), col("rnk"), col("c_id"), col("cosine")).collect()
    assert(pq.nonEmpty)
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) => assert(rs.length <= 5) }
    val exact = LlmOps.simTopk(spark, sfDir)
      .select(col("q_id"), col("rnk"), col("c_id"), col("cosine")).collect()
    // every surfaced pair carries the TRUE cosine (the re-rank is exact)
    val exactMap = exact.map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val pqPairs = pq.map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    pqPairs.foreach { case (k, c) =>
      exactMap.get(k).foreach(e => assert(math.abs(c - e) < 1e-9,
        s"pair $k: PQ re-rank cosine $c != exact $e")) }
    // recall@5 of the compressed scan vs the exact top-5 — PQ with
    // m=8/k=16 on 64-dim synthetic data must recover most of the true
    // neighborhood (deterministic: fixed sample, fixed init)
    val exactTop = exact.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val pqTop = pq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val common = exactTop.keySet intersect pqTop.keySet
    assert(common.nonEmpty)
    val recall = common.toSeq.map(p =>
      (exactTop(p) intersect pqTop(p)).size.toDouble / exactTop(p).size).sum / common.size
    assert(recall >= 0.5, s"PQ recall@5 collapsed to $recall")
    // bit-determinism: a second full run reproduces the same rows
    val again = LlmOpsExt.simAnnPq(spark, sfDir)
      .select(col("p_id"), col("rnk"), col("c_id"), col("cosine")).collect()
    assert(pq.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("pq_encode/pq_decode: codes bound by k, reconstruction is centroid concat, 8x fewer values") {
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val M = 8; val K = 16
    val sample = emb.filter(col("vec_id") < 256).orderBy(col("vec_id").asc)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = sample.head.length
    val sub = dim / M
    val flat = (0 until M).toArray.flatMap { mi =>
      LlmOpsExt.kmeansL2(sample.map(_.slice(mi * sub, (mi + 1) * sub)), K).flatten
    }
    assert(flat.length == M * K * sub)
    val coded = emb.select(col("vec_id"),
      graft.functions.HashKernels.pq_encode(col("embedding"), flat, M, K).as("codes"),
      graft.functions.HashKernels.pq_decode(
        graft.functions.HashKernels.pq_encode(col("embedding"), flat, M, K),
        flat, M, K).as("recon")).collect()
    coded.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == M, "one code per subspace") // dim/sub compression
      assert(codes.forall(c => c >= 0 && c < K))
      val recon = r.getSeq[Double](2)
      assert(recon.length == dim)
      // reconstruction = exact concatenation of the coded centroids
      codes.zipWithIndex.foreach { case (c, mi) =>
        val cent = flat.slice((mi * K + c) * sub, (mi * K + c) * sub + sub)
        assert(recon.slice(mi * sub, (mi + 1) * sub) == cent.toSeq)
      }
    }
  }
}
