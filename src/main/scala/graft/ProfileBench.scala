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
    // r20: shared GraftSession posture so job profiles match the bench.
    // SPARK_GRAFT_EXTRA_CONF ("k=v;k=v") is the A/B experiment hook —
    // candidate flags are measured here before they may enter
    // GraftSession (guide §1: measure first).
    val b0 = GraftSession.base(cpus)
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(';').toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      }
    val spark = b.getOrCreate()
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
        // r20: prefix the SQL execution ids so jobs group by STATEMENT —
        // rootExecId counts actions, execId separates AQE sub-executions
        val execId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))).getOrElse("-")
        val rootId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id"))).getOrElse(execId)
        val d = s"exec=$rootId " + Option(e.properties)
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

    // r20 (ADVICE r19 #3): validate names up front with a clear error
    // instead of a bare NoSuchElementException mid-run
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — valid names are in SparkEntry.queries")

    // r20 DRIVER-GAP ATTRIBUTION (guide §7.3, programmatic): the r19
    // profile showed 40-50% of lifecycle wall time is the gap BETWEEN
    // jobs — driver-side work the job listener can't see. A sampling
    // thread grabs the query thread's stack every few ms while the timed
    // run executes; aggregating by "deepest interesting frame" splits the
    // gap into Catalyst analysis/optimization, physical planning, codegen
    // compilation, file listing, commit IO, etc. Enable with
    // SPARK_GRAFT_STACKS=1 (adds ~0 overhead to the measured thread — the
    // sampler runs on its own core).
    val sampleStacks = sys.env.getOrElse("SPARK_GRAFT_STACKS", "0") == "1"
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm pass (retire codegen/JIT/FS-metadata one-time costs)
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"$n warm FAILED: ${e.getMessage}") }
      jobs.synchronized(jobs.clear()); collecting = true
      val mainThread = Thread.currentThread()
      val stackCounts = new scala.collection.mutable.HashMap[String, Int]
      val execCounts = new scala.collection.mutable.HashMap[String, Int]
      @volatile var sampling = sampleStacks
      val sampler = new Thread(() => {
        while (sampling) {
          // executor-side view (local mode: same JVM): sample the task
          // launch workers too, so the inside of the 100-250 ms AQE
          // mini-jobs is attributable (codegen compile? parquet open?
          // commit rename? shuffle?)
          val all = Thread.getAllStackTraces
          all.forEach { (t, est) =>
            if (t.getName.startsWith("Executor task launch") &&
                t.getState == Thread.State.RUNNABLE && est.nonEmpty) {
              // deepest interesting frame + 2 distinct-class callers, so
              // a hot leaf (conf deserialization, classloading) is
              // attributable to WHO invokes it
              val interesting = est.iterator.filter { f =>
                val c = f.getClassName
                !c.startsWith("java.") && !c.startsWith("jdk.") &&
                !c.startsWith("scala.") && !c.startsWith("sun.") &&
                !c.contains("$Lambda")
              }.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
                .toSeq
              val chain = interesting.foldLeft(Seq.empty[String])((acc, f) =>
                if (acc.size < 3 && !acc.lastOption.contains(f)) acc :+ f else acc)
              val key = if (chain.nonEmpty) chain.mkString(" <- ")
                else s"${est.head.getClassName}.${est.head.getMethodName}"
              execCounts.synchronized {
                execCounts(key) = execCounts.getOrElse(key, 0) + 1
              }
            }
          }
          val state = mainThread.getState
          val st = mainThread.getStackTrace
          if (st.nonEmpty) {
            // a parked/waiting query thread is waiting on a JOB — that
            // time belongs to the job listener's account, not the gap
            val key = if (state == Thread.State.WAITING ||
                          state == Thread.State.TIMED_WAITING ||
                          state == Thread.State.BLOCKED)
              "WAITING(job or lock)"
            else st.find { f =>
              val c = f.getClassName
              (c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
               c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
               c.startsWith("org.apache.spark.sql.catalyst.rules") ||
               c.startsWith("org.apache.spark.sql.catalyst.plans") ||
               c.startsWith("org.apache.spark.sql.execution") ||
               c.startsWith("org.apache.spark.sql.codegen") ||
               c.startsWith("org.codehaus.janino") ||
               c.startsWith("org.apache.hadoop.fs") ||
               c.startsWith("org.apache.parquet") ||
               c.startsWith("graft.")) && !c.contains("$Lambda")
            }.map(f => s"${f.getClassName}.${f.getMethodName}")
              .getOrElse(st.headOption.map(f =>
                s"${f.getClassName}.${f.getMethodName}").getOrElse("?"))
            stackCounts.synchronized {
              stackCounts(key) = stackCounts.getOrElse(key, 0) + 1
            }
          }
          Thread.sleep(2)
        }
      })
      sampler.setDaemon(true)
      if (sampleStacks) sampler.start()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
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
      val nExecs = js.map(_.desc.split(" ").head).distinct.size
      println(s"  [$nExecs distinct root SQL executions (statements)]")
      if (sampleStacks) {
        val total = stackCounts.synchronized(stackCounts.values.sum).max(1)
        println(s"  --- driver-thread samples (query thread, ~2 ms period, n=$total) ---")
        stackCounts.synchronized(stackCounts.toSeq).sortBy(-_._2).take(30)
          .foreach { case (k, c) =>
            println(f"  STACK ${c * 100.0 / total}%5.1f%% n=$c%4d  $k")
          }
        val etotal = execCounts.synchronized(execCounts.values.sum).max(1)
        println(s"  --- executor-thread RUNNABLE samples (n=$etotal thread-samples) ---")
        execCounts.synchronized(execCounts.toSeq).sortBy(-_._2).take(25)
          .foreach { case (k, c) =>
            println(f"  EXEC ${c * 100.0 / etotal}%5.1f%% n=$c%4d  $k")
          }
        execCounts.synchronized(execCounts.clear())
      }
    }
    spark.stop()
  }
}
