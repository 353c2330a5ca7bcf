package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.PcapFixtures.BaseTs

/** DataSource V2 connector tests: schema, per-file partitioning, and
  * row-level agreement with the direct parser. */
class PcapSourceSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("pcap-src").toFile
    Files.write(new java.io.File(d, "a.pcap").toPath, PcapFixtures.goldenPcap)
    val second = PcapFixtures.pcapFile(Seq(
      (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(6,
        Array[Byte](10, 9, 9, 9), Array[Byte](10, 8, 8, 8),
        PcapFixtures.l4Ports(80, 8080))), BaseTs)))
    Files.write(new java.io.File(d, "b.pcap").toPath, second)
    d.getAbsolutePath
  }

  test("format(\"pcap\") reads a directory with one partition per file") {
    val df = spark.read.format("pcap").load(dir)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 13) // 12 golden + 1
  }

  test("splitBytes: forced multi-way split yields byte-identical rows to the unsplit read") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(s => (s.head.toString, s(1).asInstanceOf[Long]))
    val unsplit = spark.read.format("pcap").load(dir)
    val split = spark.read.format("pcap").option("splitBytes", "64").load(dir)
    assert(split.rdd.getNumPartitions > unsplit.rdd.getNumPartitions,
      "test premise: 64-byte chunks must out-partition one-per-file")
    assert(rows(split).toSeq == rows(unsplit).toSeq)
    // a mixed directory: .pcapng chunks take the full-read straddle path
    val d2 = Files.createTempDirectory("pcap-split-ng").toFile
    Files.write(new java.io.File(d2, "g.pcapng").toPath, PcapFixtures.goldenPcapng)
    val ngUnsplit = spark.read.format("pcap").load(d2.getAbsolutePath)
    val ngSplit = spark.read.format("pcap").option("splitBytes", "64")
      .load(d2.getAbsolutePath)
    assert(ngSplit.rdd.getNumPartitions > 1)
    assert(rows(ngSplit).toSeq == rows(ngUnsplit).toSeq)
  }

  test("splitBytes: a malformed capture still names the file from a chunk reader") {
    val d = Files.createTempDirectory("pcap-split-bad").toFile
    val cut = PcapFixtures.goldenPcap
    Files.write(new java.io.File(d, "cut.pcap").toPath, cut.take(cut.length - 7))
    val e = intercept[Exception] {
      spark.read.format("pcap").option("splitBytes", "64")
        .load(d.getAbsolutePath).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("cut.pcap"), s"error chain must name the capture:\n$msgs")
  }

  test("pcap_ipv6_flows: QinQ and plain IPv6 frames land in the same flow") {
    val out = PcapOps.pcapIpv6Flows(spark, sfDir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(2)), r.getLong(3)))
    // the QinQ-wrapped UDP frame merges with its untagged twin: n_pkts = 2
    assert(out.contains((Some("2001:0:0:0:0:0:0:3"), Some("UDP"), 2L)),
      s"QinQ flow must merge with the plain IPv6 flow: ${out.toSeq}")
    assert(out.contains((Some("2001:0:0:0:0:0:0:6"), Some("ICMPv6"), 1L)))
    assert(out.contains((Some("10.0.0.1"), Some("TCP"), 1L))) // v4 control row
    assert(out.length == 5)
  }

  test("connector rows agree with the direct parser") {
    val viaSource = spark.read.format("pcap").load(dir)
      .filter(org.apache.spark.sql.functions.col("file").endsWith("a.pcap"))
      .drop("file")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(4))))
      .sortBy(_._1)
    val direct = PcapParser.parseFile(PcapFixtures.goldenPcap).toVector
      .map(p => (p.pkt_idx, p.dst_ip, p.protocol))
    assert(viaSource.toVector == direct)
  }

  test("schema exposes the 9 reference columns plus file and pkt_idx") {
    val fields = spark.read.format("pcap").load(dir).schema.fieldNames.toSeq
    assert(fields == Seq("file", "pkt_idx", "src_ip", "dst_ip", "len",
      "protocol", "src_port", "dst_port", "mm_ts", "mm_id", "mm_port"))
  }

  test("column pruning reaches the scan: SELECT protocol reads a 1-column schema") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("pcap").load(dir)
      .select(org.apache.spark.sql.functions.col("protocol"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("protocol"),
      s"scan not pruned: ${scan.scan.readSchema().fieldNames.mkString(",")}")
    // and the pruned read still returns correct values
    val protos = df.collect().map(r => Option(r.getString(0)))
    assert(protos.count(_.contains("UDP")) == 6 && protos.count(_.contains("TCP")) == 2)
  }

  test("readStream.format(\"pcap\") picks up files as the capture directory grows") {
    val d = Files.createTempDirectory("pcap-stream").toFile
    Files.write(new java.io.File(d, "c00.pcap").toPath, PcapFixtures.goldenPcap)
    val q = spark.readStream.format("pcap").load(d.getAbsolutePath)
      .writeStream.format("memory").queryName("pcap_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("pcap_stream_out").count() == 12)
    // a new capture file rolls in — next trigger must pick up ONLY it
    Files.write(new java.io.File(d, "c01.pcap").toPath, PcapFixtures.pcapFile(Seq(
      (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(6,
        Array[Byte](10, 1, 1, 1), Array[Byte](10, 2, 2, 2),
        PcapFixtures.l4Ports(22, 2222))), BaseTs))))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("pcap_stream_out")
    assert(rows.count() == 13)
    import org.apache.spark.sql.functions.col
    assert(rows.filter(col("file").endsWith("c01.pcap")).count() == 1)
  }

  test("stream offset pins the last filename: a listing shift fails loudly, not silently") {
    val d = Files.createTempDirectory("pcap-shift").toFile
    Files.write(new java.io.File(d, "m00.pcap").toPath, PcapFixtures.goldenPcap)
    val q = spark.readStream.format("pcap").load(d.getAbsolutePath)
      .writeStream.format("memory").queryName("pcap_shift_out")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("pcap_shift_out").count() == 12)
    // a file landing with a lexicographically EARLIER name breaks the
    // append-only contract the offset encodes — indices would silently
    // shift and replay m00's packets as "new"; must fail instead
    Files.write(new java.io.File(d, "a00.pcap").toPath, PcapFixtures.pcapFile(Seq(
      (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(6,
        Array[Byte](10, 1, 1, 1), Array[Byte](10, 2, 2, 2),
        PcapFixtures.l4Ports(22, 2222))), BaseTs))))
    val ex = intercept[Exception] { q.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("append-only")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
    q.stop()
  }

  test("maxFilesPerTrigger: a backlog drains in bounded batches; offsets resume exactly across restart (r15, VERDICT r14 #6)") {
    def onePkt(sport: Int): Array[Byte] = PcapFixtures.pcapFile(Seq(
      (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(6,
        Array[Byte](10, 1, 1, 1), Array[Byte](10, 2, 2, 2),
        PcapFixtures.l4Ports(sport, 443))), BaseTs + sport)))
    val d = Files.createTempDirectory("pcap-admission").toFile
    // a 5-file backlog exists BEFORE the query starts — the un-capped
    // source would plan all of it into one giant batch
    (0 until 5).foreach(i =>
      Files.write(new java.io.File(d, f"b$i%02d.pcap").toPath, onePkt(1000 + i)))
    val ckpt = Files.createTempDirectory("pcap-admission-ckpt").toFile.getAbsolutePath
    // a FILE sink: recoverable from the checkpoint, unlike memory
    val out = Files.createTempDirectory("pcap-admission-out").toFile.getAbsolutePath
    def start() = spark.readStream.format("pcap")
      .option("maxFilesPerTrigger", "2").load(d.getAbsolutePath)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = start()
    q.processAllAvailable()
    // bounded drain: ceil(5/2) = 3 batches, none above the cap (one
    // packet per file makes numInputRows == files admitted)
    val p1 = q.recentProgress.filter(_.numInputRows > 0)
    assert(p1.length == 3 && p1.forall(_.numInputRows <= 2),
      s"drain shape: ${p1.map(_.numInputRows).mkString(",")}")
    assert(spark.read.parquet(out).count() == 5)
    q.stop()
    // RESTART against the same checkpoint with three more rolled files:
    // the committed (count, lastName) offset resumes exactly — no
    // replay of the five drained files, no skip — and the new backlog
    // drains capped too
    (5 until 8).foreach(i =>
      Files.write(new java.io.File(d, f"b$i%02d.pcap").toPath, onePkt(1000 + i)))
    val q2 = start()
    q2.processAllAvailable()
    val p2 = q2.recentProgress.filter(_.numInputRows > 0)
    q2.stop()
    assert(p2.length == 2 && p2.forall(_.numInputRows <= 2),
      s"post-restart drain shape: ${p2.map(_.numInputRows).mkString(",")}")
    // exactly the 8 files' packets, once each — a replay would exceed 8,
    // a skip would miss a file
    val rows = spark.read.parquet(out)
    assert(rows.count() == 8, "restart must resume after the committed offset")
    val seen = rows.select("file").distinct().collect().map(_.getString(0)).toSet
    assert(seen.size == 8 && (0 until 8).forall(i =>
      seen.exists(_.endsWith(f"b$i%02d.pcap"))), s"files seen: $seen")
  }

  test("Trigger.AvailableNow + maxFilesPerTrigger: the backlog drains in bounded batches and the query self-terminates (r15)") {
    def onePkt2(sport: Int): Array[Byte] = PcapFixtures.pcapFile(Seq(
      (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(17,
        Array[Byte](10, 3, 3, 3), Array[Byte](10, 4, 4, 4),
        PcapFixtures.l4Ports(sport, 53))), BaseTs + sport)))
    val d = Files.createTempDirectory("pcap-availnow").toFile
    (0 until 5).foreach(i =>
      Files.write(new java.io.File(d, f"a$i%02d.pcap").toPath, onePkt2(2000 + i)))
    val out = Files.createTempDirectory("pcap-availnow-out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("pcap-availnow-ckpt").toFile.getAbsolutePath
    val q = spark.readStream.format("pcap")
      .option("maxFilesPerTrigger", "2").load(d.getAbsolutePath)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    // drained to the start-time target in ceil(5/2) = 3 bounded batches
    val p = q.recentProgress.filter(_.numInputRows > 0)
    assert(p.length == 3 && p.forall(_.numInputRows <= 2),
      s"drain shape: ${p.map(_.numInputRows).mkString(",")}")
    assert(spark.read.parquet(out).count() == 5)
  }

  test("listing and reading go through the Hadoop FileSystem API: file:// scheme works") {
    // an explicit file:// URI exercises scheme resolution end-to-end — the
    // same code path hdfs:// or s3a:// capture directories take
    val df = spark.read.format("pcap").load("file://" + dir)
    assert(df.count() == 13)
    val files = PcapDataSource.listCaptureFiles("file://" + dir, spark.sessionState.newHadoopConf())
    assert(files.size == 2 && files.forall(_.startsWith("file:")))
  }

  test("filter pushdown reaches the scan: protocol filter shows in PushedFilters") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("pcap").load(dir).filter(col("protocol") === "TCP")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.description().contains("EqualTo(protocol,TCP)") &&
      scan.scan.description().contains("PushedFilters"),
      s"filter not pushed: ${scan.scan.description()}")
    assert(df.count() == 2) // 1 golden TCP + 1 in b.pcap
  }

  test("pushed filters drop rows inside the reader, before row construction") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual}
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    def readerCount(filters: Array[org.apache.spark.sql.sources.Filter]): Long = {
      val factory = new PcapReaderFactory(PcapDataSource.schema, filters, strict = true, conf)
      PcapDataSource.listCaptureFiles(dir, spark.sessionState.newHadoopConf()).map { f =>
        val r = factory.createReader(PcapFilePartition(f))
        var n = 0L
        while (r.next()) n += 1
        r.close()
        n
      }.sum
    }
    assert(readerCount(Array.empty) == 13)
    assert(readerCount(Array(EqualTo("protocol", "UDP"))) == 6)
    assert(readerCount(Array(EqualTo("protocol", "TCP"),
      GreaterThanOrEqual("src_port", 100))) == 1) // golden TCP src=443; b.pcap TCP src=80 drops
  }

  test("strict mode (the default) raises naming the corrupt capture; permissive salvages") {
    val d = Files.createTempDirectory("pcap-bad").toFile
    Files.write(new java.io.File(d, "good.pcap").toPath, PcapFixtures.goldenPcap)
    Files.write(new java.io.File(d, "zbad.pcap").toPath,
      Array[Byte](0x0a, 0x0d, 0x0d, 0x0a) ++ Array.fill[Byte](40)(0)) // pcapng magic
    val ex = intercept[Exception] {
      spark.read.format("pcap").load(d.getAbsolutePath).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("zbad.pcap")),
      s"error does not name the file: ${messages(ex).mkString(" | ")}")
    val salvaged = spark.read.format("pcap").option("mode", "permissive")
      .load(d.getAbsolutePath)
    assert(salvaged.count() == 12) // the 12 golden rows; the bad file reads as empty
  }

  test("a pushed file-predicate skips rejected partitions without any I/O") {
    import org.apache.spark.sql.sources.EqualTo
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    // the partition points at a NONEXISTENT capture: if the reader tried to
    // read it, this would throw FileNotFound — an empty result proves the
    // file-level reject short-circuits before the fetch
    val factory = new PcapReaderFactory(PcapDataSource.schema,
      Array(EqualTo("file", "file:/captures/other.pcap")), strict = true, conf)
    val r = factory.createReader(PcapFilePartition("file:/does/not/exist.pcap"))
    assert(!r.next())
    r.close()
    // sanity: the same predicate MATCHING the partition's file still reads
    val real = PcapDataSource.listCaptureFiles(dir, spark.sessionState.newHadoopConf()).head
    val f2 = new PcapReaderFactory(PcapDataSource.schema,
      Array(EqualTo("file", real)), strict = true, conf)
    val r2 = f2.createReader(PcapFilePartition(real))
    var n = 0
    while (r2.next()) n += 1
    r2.close()
    assert(n == 12) // a.pcap = the 12 golden records
  }

  test("scan reports capture byte size to the planner (SupportsReportStatistics)") {
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val scan = new PcapScanBuilder(dir, strict = true, conf).build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val stats = scan.estimateStatistics()
    val expected = PcapDataSource.listCaptureFiles(dir, spark.sessionState.newHadoopConf())
      .map(f => new java.io.File(new java.net.URI(f)).length()).sum
    assert(stats.sizeInBytes.isPresent && stats.sizeInBytes.getAsLong == expected)
    assert(!stats.numRows.isPresent) // honestly unknown: pcap has no record count
  }

  test("pcap_filter_push: pushed plan + rows agree with the unfiltered histogram") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.functions.{col, sum}
    val pushed = PcapOps.pcapFilterPush(spark, sfDir)
    // sparkPlan, not executedPlan: AQE wraps the aggregate in an
    // AdaptiveSparkPlanExec whose subtree is hidden until execution
    val scan = pushed.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.description().contains("EqualTo(protocol,TCP)"),
      s"protocol filter not pushed: ${scan.scan.description()}")
    val nFiltered = pushed.agg(sum(col("n"))).collect()(0).getLong(0)
    val nTcp = PcapOps.pcapIngestLarge(spark, sfDir)
      .filter(col("protocol") === "TCP").collect()(0).getAs[Long]("n")
    assert(nFiltered == nTcp && nTcp > 0)
  }

  test("pcap_flows agrees with an in-memory flow fold over the direct parser") {
    import org.apache.spark.sql.Row
    val got = PcapOps.pcapFlows(spark, sfDir).collect().map {
      case Row(si, di, sp, dp, proto, n, bytes, first, last, dur) =>
        ((Option(si), Option(di), Option(sp), Option(dp), Option(proto)),
         (n.asInstanceOf[Long], Option(bytes), Option(dur)))
    }.toMap
    val expected = PcapParser.parseFile(PcapFixtures.goldenPcap).toVector
      .groupBy(p => (p.src_ip, p.dst_ip, p.src_port, p.dst_port, p.protocol))
      .map { case (k, ps) =>
        val ts = ps.flatMap(_.mm_ts)
        val bytes = ps.flatMap(_.len)
        (k, (ps.size.toLong,
             if (bytes.isEmpty) None else Some(bytes.sum),
             if (ts.isEmpty) None else Some(ts.max - ts.min)))
      }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"flow $k") }
    // multi-packet flows must exist in the fixture, else this test is vacuous
    assert(expected.values.exists(_._1 > 1))
  }

  test("pcap_topk_talkers: top-5 by bytes matches the fold; plans as TakeOrderedAndProject") {
    val df = PcapOps.pcapTopkTalkers(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global sort+limit must plan as per-partition top-k")
    val got = df.collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getAs[Long]("total_bytes")))
    // rebuild the same 200k-frame capture largeCaptureDir() lays down
    val base = PcapFixtures.goldenFrames
    val largeBytes = PcapFixtures.pcapFile((0 until 200000).map { i =>
      val (bytes, ts) = base(i % base.size); (bytes, ts + (i / base.size))
    })
    val expected = PcapParser.parseFile(largeBytes).toVector
      .filter(_.src_ip.isDefined)
      .groupBy(p => (p.src_ip, p.dst_ip, p.src_port, p.dst_port, p.protocol))
      .map { case (k, ps) => (k, ps.flatMap(_.len).map(_.toLong).sum) }
      .toSeq
      .sortBy { case ((si, di, sp, dp, _), bytes) => (-bytes, si.toString, di.toString) }
      .take(5)
    assert(got.length == 5)
    assert(got.map(_._3).toSeq == expected.map(_._2),
      s"byte totals differ: ${got.map(_._3).toSeq} vs ${expected.map(_._2)}")
  }

  test("flowAgg builder: streaming (complete mode) equals batch on the same captures") {
    import org.apache.spark.sql.functions.col
    val streamed = PcapOps.flowAgg(spark.readStream.format("pcap").load(dir))
    val q = streamed.writeStream.format("memory")
      .queryName("pcap_flows_stream").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) = (0 to 4).map(i => Option(r.get(i)))
    val got = spark.table("pcap_flows_stream").collect()
      .map(r => key(r) -> (r.getLong(5), Option(r.get(6)), Option(r.get(9)))).toMap
    val batch = PcapOps.flowAgg(spark.read.format("pcap").load(dir)).collect()
      .map(r => key(r) -> (r.getLong(5), Option(r.get(6)), Option(r.get(9)))).toMap
    assert(got == batch && got.nonEmpty)
  }

  test("pruned scans skip unrequested decode work but agree column-wise") {
    // mm_* only: network fields never decoded; values must still match the
    // full-decode parser on the overlapping columns
    val viaPruned = spark.read.format("pcap").load(dir)
      .filter(org.apache.spark.sql.functions.col("file").endsWith("a.pcap"))
      .select("pkt_idx", "mm_ts", "mm_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .sortBy(_._1)
    val direct = PcapParser.parseFile(PcapFixtures.goldenPcap).toVector
      .map(p => (p.pkt_idx, p.mm_ts, p.mm_id))
    assert(viaPruned.toVector == direct)
  }

  test("runtime filtering: an execution-time In(file, ...) re-plans fewer partitions (r8)") {
    import org.apache.spark.sql.sources.In
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val files = PcapDataSource.listCaptureFiles(dir, conf.value)
    assert(files.size == 2)
    val sb = new PcapScanBuilder(dir, strict = true, conf)
    assert(sb.filterAttributes().map(_.describe()).toSeq == Seq("file"))
    assert(sb.planInputPartitions().length == 2)
    // Spark hands the dim side's values to filter() at execution time;
    // the re-plan must drop the non-matching capture entirely
    sb.filter(Array[org.apache.spark.sql.sources.Filter](In("file", Array(files.head))))
    val planned = sb.planInputPartitions()
    assert(planned.length == 1, s"runtime filter kept ${planned.length} of 2 partitions")
    assert(planned.head.asInstanceOf[PcapFilePartition].file == files.head)
    // and rows behind the runtime filter stay exact
    val factory = sb.createReaderFactory()
    val reader = factory.createReader(planned.head)
    var n = 0
    while (reader.next()) n += 1
    assert(n == 12, s"expected the 12 golden rows, got $n") // a.pcap sorts first
  }

  test("runtime filtering e2e: join against a 1-file dim is exact (r8)") {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val files = PcapDataSource.listCaptureFiles(dir, conf.value)
    val dim = Seq(files.last).toDF("file")
    val got = spark.read.format("pcap").load(dir)
      .join(dim, "file").agg(org.apache.spark.sql.functions.count("*")).head.getLong(0)
    assert(got == 1, s"b.pcap holds 1 packet, join returned $got")
  }
}
