package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r19 optimization probe (guide §1: measure first): run the named
  * queries once warm + once timed, with a listener that attributes wall
  * time to Spark JOBS (count, per-job seconds, stage/task counts) so
  * machinery-bound queries (MV lifecycle, CDC apply) show WHERE the time
  * goes — job-count overhead vs a few heavy stages — before anything is
  * changed. Usage: runMain graft.ProfileBench <sfDir> <query> [query ...]
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // same AQE posture as Bench.scala so job profiles match the bench
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count() catch { case _: Throwable => () }

    case class JobRec(id: Int, desc: String, ms: Long, stages: Int, tasks: Int)
    val jobs = new scala.collection.mutable.ArrayBuffer[JobRec]
    val starts = new scala.collection.concurrent.TrieMap[Int, (Long, String, Seq[Int])]
    val stageNames = new scala.collection.concurrent.TrieMap[Int, String]
    val stageTasks = new scala.collection.concurrent.TrieMap[Int, Int]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        e.stageInfos.foreach(si => stageNames.put(si.stageId, si.name))
        val sn = e.stageInfos.map(_.name).distinct.mkString(" | ")
        starts.put(e.jobId, (e.time, if (d.nonEmpty) d + " :: " + sn else sn, e.stageIds))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageTasks.put(e.stageInfo.stageId, e.stageInfo.numTasks)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collecting) {
        starts.remove(e.jobId).foreach { case (t0, d, sids) =>
          val label = d
          val nt = sids.flatMap(stageTasks.get).sum
          jobs.synchronized { jobs += JobRec(e.jobId, label, e.time - t0, sids.size, nt) }
        }
      }
    })

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm pass (retire codegen/JIT/FS-metadata one-time costs)
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"$n warm FAILED: ${e.getMessage}") }
      jobs.synchronized(jobs.clear()); collecting = true
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(300) // let listener drain
      val js = jobs.synchronized(jobs.toList)
      val jobSum = js.map(_.ms).sum / 1e3
      println(f"\n===== $n%s wall=$wall%.3f s  jobs=${js.size}%d  jobTimeSum=$jobSum%.3f s  gap=${wall - jobSum}%.3f s")
      js.sortBy(-_.ms).take(25).foreach { j =>
        println(f"  job ${j.id}%4d ${j.ms / 1e3}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%3d  ${j.desc.take(100)}")
      }
      // aggregate by callsite so repeated machinery lines stand out
      js.groupBy(_.desc).map { case (d, g) => (d, g.size, g.map(_.ms).sum) }
        .toSeq.sortBy(-_._3).take(20).foreach { case (d, n, ms) =>
          println(f"  BYSITE ${ms / 1e3}%7.3f s  n=$n%3d  ${d.take(100)}")
        }
      val small = js.count(_.ms < 100)
      println(f"  [${js.size}%d jobs total; $small%d under 100 ms; sum of those=${js.filter(_.ms < 100).map(_.ms).sum / 1e3}%.3f s]")
    }
    spark.stop()
  }
}
