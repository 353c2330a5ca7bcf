package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TableFormat

/** Scale probe for PREDICATE-SCOPED OPTIMIZE (r15, VERDICT r14 #7):
  * `optimize_where` has no driver bench query (procedure + spec only),
  * so its sf1 slope needs its own harness. Builds a doc_id-clustered
  * table from the corpus's `documents`, fragments a FIXED-WIDTH hot key
  * range with three micro-appends, and times the scoped optimize. The
  * scale claim under test: the rewrite cost follows the INTERSECTING
  * files (the hot range), not the table — at 10× data the same-width
  * range should cost roughly the same, while a full optimize would pay
  * 10×.
  *
  * Usage: OptimizeWhereProbe <sfDir>  → one JSON line
  * `{"probe":"optimize_where","files_rewritten":N,"files_total":M,"sec":S}`. */
object OptimizeWhereProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"${Tables.scratchDir}/owp_probe"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    // file count scales with the data so per-FILE size stays constant —
    // the claim under test is "rewrite cost follows the intersecting
    // files", which only means something when files don't grow with SF
    val n = docs.count()
    val nFiles = math.max(8, (n / 625L).toInt)
    TableFormat.commit(spark, base, docs, 1, parent = None,
      statsCol = Some("doc_id"), clusterFiles = Some(nFiles))
    // fragment a FIXED hot key range (same absolute width at every SF)
    (1 to 3).foreach { t =>
      TableFormat.appendCommit(spark, base,
        docs.filter(col("doc_id") < 500).withColumn("n_chars",
          col("n_chars") + lit(t)),
        statsCol = Some("doc_id"))
    }
    val t0 = System.nanoTime()
    val (_, rewritten, total) = TableFormat.optimizeWhere(spark, base, 0L, 500L)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"optimize_where","files_rewritten":$rewritten,"files_total":$total,"sec":$sec%.3f}""")
    spark.stop()
  }
}
