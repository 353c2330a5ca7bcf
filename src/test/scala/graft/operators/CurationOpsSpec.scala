package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** r5 curation surface: integer-exact keep verdicts, packing
  * conservation, BM25 plan hygiene, and mixture-weight monotonicity. */
class CurationOpsSpec extends SparkTestBase {

  test("text_repetition: keep verdict is exactly the integer-threshold predicate") {
    val rows = CurationOps.textRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nUniq, topBi, keep) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5))
      assert(nUniq >= 1 && nUniq <= nTok)
      assert(keep == (nUniq * 4 > nTok && topBi * 10 < nTok),
        s"verdict drifted from its integer definition at doc ${r.getLong(0)}")
      val uniqFrac = r.getDouble(3)
      assert(uniqFrac > 0 && uniqFrac <= 1.0)
    }
  }

  test("seq_pack: bins are contiguous from 0 and conserve every token") {
    val out = CurationOps.seqPack(spark, sfDir).collect()
    val perSource = out.groupBy(_.getString(0))
    val totalBySource = graft.Tables.t(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0, s"$src: first bin ${bins.head}")
      assert(bins.toList == (bins.head to bins.last).toList,
        s"$src: bins not contiguous: ${bins.mkString(",")}")
      assert(rows.map(_.getLong(3)).sum == totalBySource(src),
        s"$src: packed token total diverged from the corpus")
    }
  }

  test("text_bm25: 5 docs per query term, scores non-increasing, no ScalaUDF") {
    val df = CurationOps.textBm25(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "BM25 scoring must stay codegen'd")
    val rows = df.collect()
    assert(rows.length == 15, s"expected 3 terms x 5 docs, got ${rows.length}")
    rows.groupBy(_.getString(0)).foreach { case (term, rs) =>
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$term: scores not non-increasing: ${scores.mkString(",")}")
    }
  }

  test("mix_domain_stats: shares sum to ~1 and sqrt-weight dominates share") {
    val rows = CurationOps.mixDomainStats(spark, sfDir).collect()
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 0.01, s"token shares sum to $shareSum")
    rows.foreach { r =>
      assert(r.getDouble(5) >= r.getDouble(4),
        "sqrt temperature weight must up-weight every (sub-unit) share")
    }
  }
}
