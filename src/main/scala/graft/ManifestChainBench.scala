package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.operators.TableFormat

/** Delta-log chain microbench (r16, VERDICT r15 #5): drive the manifest
  * machinery to 10⁴ commits — two orders beyond what the sf-scale tests
  * reach — and measure, per commit index, (a) the bytes the commit
  * wrote under `_manifests/` and (b) the cold resolution time of
  * `manifestEntries`. Expected curve: a flat sawtooth — deltas stay
  * O(change) regardless of table size, a full checkpoint every
  * [[TableFormat.CheckpointEvery]] commits grows with the entry count,
  * and resolution stays bounded by the ≤16-deep delta chain walk.
  *
  * Appends go through [[TableFormat.appendCommitStaged]] (footer-read
  * ingest — ZERO Spark jobs per commit), so the bench measures the
  * metadata path itself, not executor scheduling.
  *
  * Usage:  ManifestChainBench <scratch-dir> <n-commits> build
  *         ManifestChainBench <scratch-dir> <n-commits> resolve
  * `build` creates the chain and prints one JSON line per bucket;
  * `resolve` (run in a FRESH JVM — the entries cache must be cold)
  * samples `manifestEntries` latency across the chain.
  */
object ManifestChainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_chainbench")
    val n = args.lift(1).map(_.toInt).getOrElse(10000)
    val mode = args.lift(2).getOrElse("build")
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"$dir/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (mode == "build") build(spark, fs, dir, base, n)
    else resolve(spark, base, n)
    spark.stop()
  }

  private def build(spark: SparkSession,
                    fs: org.apache.hadoop.fs.FileSystem, dir: String,
                    base: String, n: Int): Unit = {
    import spark.implicits._
    fs.delete(new Path(dir), true)
    // one tiny parquet, copied driver-side per commit: every append has
    // its own path, no Spark job anywhere in the loop
    val stage = s"$dir/stage"
    Seq((0L, 0L)).toDF("k", "v").coalesce(1).write.parquet(stage)
    val seed = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val schema = spark.read.parquet(stage).schema
    val mdir = new Path(s"$base/_manifests")
    def manifestBytesOf(v: Int): Long =
      fs.listStatus(mdir).filter { st =>
        val nm = st.getPath.getName
        nm == s"v$v.manifest" || nm.startsWith(s"v$v.")
      }.map(_.getLen).sum
    val bucket = 512
    var bDelta = List.empty[Long]   // delta-manifest bytes in the bucket
    var bFull = List.empty[Long]    // checkpoint (full) bytes in the bucket
    var bMs = List.empty[Double]    // per-commit wall ms
    println("""{"bench":"manifest_chain","unit":"bytes/ms","bucket":512}""")
    var v = 0
    var i = 1
    while (i <= n) {
      val f = new Path(s"$dir/files/f$i.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, seed, fs, f, false, false,
        spark.sparkContext.hadoopConfiguration)
      val t0 = System.nanoTime()
      v = TableFormat.appendCommitStaged(spark, base, Seq(f.toString), schema)
      val ms = (System.nanoTime() - t0) / 1e6
      val bytes = manifestBytesOf(v)
      if (TableFormat.manifestIsParquet(spark, base, v)) bFull ::= bytes
      else bDelta ::= bytes
      bMs ::= ms
      if (i % bucket == 0) {
        def med(xs: List[Double]): Double =
          if (xs.isEmpty) 0 else xs.sorted.apply(xs.size / 2)
        println(f"""{"commit":$i,"delta_bytes_med":${med(bDelta.map(_.toDouble))}%.0f,""" +
          f""""full_bytes_max":${if (bFull.isEmpty) 0L else bFull.max},""" +
          f""""n_full":${bFull.size},"commit_ms_med":${med(bMs)}%.2f,""" +
          f""""commit_ms_p99":${bMs.sorted.apply((bMs.size * 99) / 100)}%.2f}""")
        bDelta = Nil; bFull = Nil; bMs = Nil
      }
      i += 1
    }
    println(s"""{"done":true,"head":$v,"entries":${
      TableFormat.manifestEntries(spark, base, v).size}}""")
  }

  /** Fresh-JVM pass: cold `manifestEntries` latency across the chain —
    * sampled at checkpoint versions AND at max-chain-depth versions
    * (checkpoint+15), where resolution walks the full 16-deep chain. */
  private def resolve(spark: SparkSession, base: String, n: Int): Unit = {
    val head = TableFormat.currentVersion(spark, base)
    val samples = (1 to 20).flatMap { k =>
      val v = math.max(1, (n.toLong * k / 20).toInt - 1)
      Seq(v, math.max(1, v - 15))
    }.distinct.filter(_ <= head).sorted
    samples.foreach { v =>
      val t0 = System.nanoTime()
      val sz = TableFormat.manifestEntries(spark, base, v).size
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"""{"resolve_v":$v,"entries":$sz,"cold_ms":$ms%.2f}""")
    }
  }
}
