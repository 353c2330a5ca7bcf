package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Scale probe for EQUALITY-DELETE CONSOLIDATION (r16, r17 candidate
  * #5): `consolidate_eqdel` has no driver bench query (procedure +
  * spec only), so its slope needs its own harness. Builds a table from
  * the corpus's `documents`, piles up a DEEP eq-delete backlog (48
  * delete commits interleaved with appends, cap disabled), and times:
  *
  *  - the serving read against the 48-key-file backlog,
  *  - the consolidation itself (IO ∝ total key bytes),
  *  - the serving read against the ONE consolidated file,
  *  - the full resolution from the consolidated state.
  *
  * The scale claims under test: consolidation cost follows the KEY
  * BYTES (batch-shaped — flat when the table grows 10× under the same
  * backlog), and the post-consolidation serving read never regresses
  * (one key file to open/union instead of 48).
  *
  * Usage: EqConsolidateProbe <sfDir>  → one JSON line. */
object EqConsolidateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set("spark.graft.eqdel.maxOutstanding", "0") // deep backlog
    val base = s"${Tables.scratchDir}/eqc_probe"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val n = docs.count()
    val nFiles = math.max(8, (n / 625L).toInt)
    TableFormat.commit(spark, base, docs, 1, parent = None,
      statsCol = Some("doc_id"), clusterFiles = Some(nFiles))
    // 48 delete commits of |keys| ∝ SF, interleaved with appends every
    // 6th commit so the backlog spans many added-version intervals
    val batch = math.max(50L, n / 1000L)
    val rnd = new scala.util.Random(16)
    var nextId = 10L * n
    (1 to 48).foreach { i =>
      val keys = (0 until batch.toInt).map(_ => rnd.nextLong(n))
      TableFormat.deleteByKeysEq(spark, base, keys.toDF("doc_id"), "doc_id")
      if (i % 6 == 0) {
        TableFormat.appendCommit(spark, base,
          docs.filter(col("doc_id") < batch)
            .withColumn("doc_id", col("doc_id") + lit(nextId)),
          statsCol = Some("doc_id"))
        nextId += 10L * n
      }
    }
    def serve(): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = TableFormat.readSnapshot(spark, base)
        .agg(count(lit(1)), sum(col("n_chars"))).head.getLong(0)
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val (c1, sPre) = serve()
    val t1 = System.nanoTime()
    val (_, nRecs) = TableFormat.consolidateEqDeletes(spark, base)
    val sCons = (System.nanoTime() - t1) / 1e9
    val (c2, sPost) = serve()
    require(c1 == c2, s"consolidation changed the served count: $c1 != $c2")
    val t2 = System.nanoTime()
    TableFormat.resolveEqDeletes(spark, base)
    val sRes = (System.nanoTime() - t2) / 1e9
    val (c3, _) = serve()
    require(c1 == c3, s"resolution changed the served count: $c1 != $c3")
    println(f"""{"probe":"eqdel_consolidate","rows":$n,"backlog":$nRecs,"serve_pre_s":$sPre%.3f,"consolidate_s":$sCons%.3f,"serve_post_s":$sPost%.3f,"resolve_s":$sRes%.3f}""")
    spark.stop()
  }
}
