package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.operators.TableFormat

/** Executor-side parquet writing for the table format's DSv2 write
  * paths (r9, VERDICT r8 #1/#2) — the write mirror of
  * [[GraftParquetReaderFactory]]: each task writes ONE parquet file
  * straight into the table's `data/` tree via parquet-hadoop's example
  * `Group` writer (the plain-record API parquet ships; Spark's internal
  * parquet write support isn't addressable from a connector), returns
  * the file path as its commit message, and the DRIVER turns the
  * collected paths into one manifest commit. Same type surface as the
  * stream reader: long/int/double/float/boolean/string/date.
  *
  * Scale: data volume never crosses the driver — a 1000-task epoch
  * commits 1000 paths (bytes of metadata); the manifest write is one
  * put-if-absent CAS regardless of data size. Task failure/speculation
  * is safe the same way the batch commit protocol is: each attempt
  * writes a UNIQUE file, only files named by COMMITTED messages reach
  * the manifest, and losers' orphans stay invisible until `vacuum`. */
object GraftParquetWrite {
  /** StructType → parquet MessageType (all fields optional, matching
    * Spark's nullable-by-default write behavior). */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => b.optional(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType => b.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => b.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => b.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType => b.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case DateType => b.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"graft-table writer: column ${f.name} has unsupported type $other " +
            "(supported: long/int/double/float/boolean/string/date — " +
            "write timestamps as unix micros)")
      }
    }
    b.named("graft")
  }
}

/** Commit message: the parquet file one task wrote (`None` when the
  * task saw zero rows — no file is created for empty partitions). */
case class GraftFileMessage(path: Option[String], rows: Long) extends WriterCommitMessage

/** Commit message of a BUCKET-routING task (r12): one parquet file per
  * bucket id the task saw. */
case class GraftFilesMessage(paths: Seq[String], rows: Long) extends WriterCommitMessage

/** All staged paths a write's commit messages name — both the one-file
  * and the per-bucket message shapes. */
object GraftStagedPaths {
  def of(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.flatMap {
      case GraftFileMessage(Some(p), _) => Seq(p)
      case GraftFileMessage(None, _) => Nil
      case GraftFilesMessage(ps, _) => ps
      case _ => Nil
    }
}

/** GENERATED ALWAYS AS recompute for the EXECUTOR-side write paths
  * (r11, ADVICE r10 medium): the V1 batch INSERT recomputes generated
  * columns driver-side (`withColumn` over the incoming DataFrame), but
  * row-level rewrites ([[GraftReplaceWrite]]) and the streaming sink
  * ([[GraftStreamingWrite]]) receive InternalRows straight from the
  * plan — an UPDATE of a generated column's SOURCE would persist the
  * stale derived value, silently violating GENERATED ALWAYS and
  * corrupting any layout/grouping keyed on it. Fix: on the DRIVER,
  * parse + analyze each generation expression against the write schema
  * and bind it to row ordinals; the per-task writer then runs the bound
  * projection over every row before encoding. Bound Catalyst
  * expressions are serializable case classes, and binding happens once
  * per write — the executors only evaluate. */
object GenerationProjection {
  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSeq, BindReferences, BoundReference, Cast, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}

  /** Bound output expressions recomputing every generated column of the
    * table at `base`, positional against `writeSchema`; None when the
    * table declares none (the common case — zero overhead). */
  def forWrite(spark: SparkSession, base: String,
               writeSchema: StructType): Option[Seq[Expression]] = {
    val v = TableFormat.latestVersion(spark, base)
    if (v == 0) return None
    val tbl = TableFormat.manifestSchema(spark, base, v).getOrElse(return None)
    val gen = tbl.fields.iterator
      .filter(_.metadata.contains("GENERATION_EXPRESSION"))
      .map(f => f.name -> f.metadata.getString("GENERATION_EXPRESSION")).toMap
    if (gen.isEmpty) return None
    val attrs: Seq[AttributeReference] = writeSchema.fields.toSeq
      .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    val exprs = writeSchema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      gen.get(f.name) match {
        case Some(sql) =>
          val parsed = spark.sessionState.sqlParser.parseExpression(sql)
          val analyzed = spark.sessionState.analyzer
            .execute(Project(Seq(Alias(parsed, f.name)()), LocalRelation(attrs)))
            .asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
          BindReferences.bindReference(
            Cast(analyzed, f.dataType,
              Option(spark.sessionState.conf.sessionLocalTimeZone)),
            AttributeSeq(attrs)): Expression
        case None => BoundReference(i, f.dataType, f.nullable): Expression
      }
    }
    Some(exprs)
  }
}

/** One task's writer. The file is created LAZILY on the first row, so
  * empty partitions cost nothing; abort deletes the file. `gen` (r11):
  * bound generated-column recompute expressions from
  * [[GenerationProjection.forWrite]], evaluated over each row before
  * encoding — absent for tables without generated columns. */
class GraftParquetDataWriter(file: String, schema: StructType,
                             conf: SerializableHadoopConf,
                             gen: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]] = None)
    extends DataWriter[InternalRow] {
  private val msgType = GraftParquetWrite.messageType(schema)
  private val factory = new SimpleGroupFactory(msgType)
  private var writer: ParquetWriter[org.apache.parquet.example.data.Group] = _
  private var rows = 0L
  // executor-side, once per task: codegen'd projection over the bound
  // recompute expressions (falls back to interpreted automatically)
  private lazy val genProj = gen.map(
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create)

  override def write(row0: InternalRow): Unit = {
    val row = genProj.fold(row0)(p => p(row0): InternalRow)
    if (writer == null)
      writer = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(new HadoopPath(file), conf.value))
        .withType(msgType).withConf(conf.value).build()
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema.fields(i).name
        schema.fields(i).dataType match {
          case LongType => g.add(name, row.getLong(i))
          case IntegerType => g.add(name, row.getInt(i))
          case DoubleType => g.add(name, row.getDouble(i))
          case FloatType => g.add(name, row.getFloat(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case StringType =>
            g.add(name, Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case DateType => g.add(name, row.getInt(i))
          case _ => () // unreachable: messageType already rejected it
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftFileMessage(if (writer == null) None else Some(file), rows)
  }
  override def abort(): Unit = {
    if (writer != null) writer.close()
    val p = new HadoopPath(file)
    p.getFileSystem(conf.value).delete(p, false)
    ()
  }
  override def close(): Unit = if (writer != null) { writer.close(); writer = null }
}

/** BUCKET-ROUTING task writer (r12): keeps the table's `__bkt=` layout
  * alive through the DSv2 write paths — the streaming sink and the
  * row-level-rewrite write used to stage plain files, silently knocking
  * a bucketed table off the storage-partitioned-join path until a full
  * rewrite. Each row routes to `pmod(murmur3_hash(key), n)` — exactly
  * the batch write's `hash()` semantics, including NULL → seed 42 — and
  * lands in that bucket's own lazily-created file; the commit message
  * names every file the task produced. Generated columns recompute
  * HERE (once), so a bucket key derived from a generated column routes
  * on the recomputed value like the batch path. */
class GraftBucketedDataWriter(stagingDir: String, tag: String,
                              schema: StructType, conf: SerializableHadoopConf,
                              gen: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]],
                              nBuckets: Int, keyIdx: Int)
    extends DataWriter[InternalRow] {
  private val delegates = new java.util.HashMap[Int, GraftParquetDataWriter]()
  private val keyType = schema.fields(keyIdx).dataType
  private lazy val genProj = gen.map(
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create)
  override def write(row0: InternalRow): Unit = {
    val row = genProj.fold(row0)(p => p(row0): InternalRow)
    // one shared kernel with the V2 bucket function — see GraftBucketRouting
    val b = GraftBucketRouting.of(keyType, row, keyIdx, nBuckets)
    var w = delegates.get(b)
    if (w == null) {
      w = new GraftParquetDataWriter(
        s"$stagingDir/__bkt=$b/$tag-${UUID.randomUUID.toString.take(8)}.parquet",
        schema, conf, gen = None) // generation already applied above
      delegates.put(b, w)
    }
    w.write(row)
  }
  override def commit(): WriterCommitMessage = {
    import scala.jdk.CollectionConverters._
    val msgs = delegates.values.asScala.map(_.commit()).toSeq
    GraftFilesMessage(msgs.collect { case GraftFileMessage(Some(p), _) => p },
      msgs.map(_.asInstanceOf[GraftFileMessage].rows).sum)
  }
  override def abort(): Unit = {
    import scala.jdk.CollectionConverters._
    delegates.values.asScala.foreach(_.abort())
  }
  override def close(): Unit = {
    import scala.jdk.CollectionConverters._
    delegates.values.asScala.foreach(_.close())
  }
}

class GraftStreamingWriterFactory(stagingDir: String, schema: StructType,
                                  conf: SerializableHadoopConf,
                                  gen: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]] = None,
                                  bucket: Option[(Int, Int)] = None)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    bucket match {
      case Some((n, keyIdx)) =>
        new GraftBucketedDataWriter(stagingDir, s"part-e$epochId-p$partitionId",
          schema, conf, gen, n, keyIdx)
      case None =>
        new GraftParquetDataWriter(
          s"$stagingDir/part-e${epochId}-p${partitionId}-${UUID.randomUUID.toString.take(8)}.parquet",
          schema, conf, gen)
    }
}

class GraftBatchWriterFactory(stagingDir: String, schema: StructType,
                              conf: SerializableHadoopConf,
                              gen: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]] = None,
                              bucket: Option[(Int, Int)] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    bucket match {
      case Some((n, keyIdx)) =>
        new GraftBucketedDataWriter(stagingDir, s"part-p$partitionId",
          schema, conf, gen, n, keyIdx)
      case None =>
        new GraftParquetDataWriter(
          s"$stagingDir/part-p${partitionId}-${UUID.randomUUID.toString.take(8)}.parquet",
          schema, conf, gen)
    }
}

/** Native streaming sink into the table format (r9, VERDICT r8 #1):
  * `writeStream.format("graft-table")` (or `.toTable("graft.db.t")`)
  * plans each micro-batch as a distributed parquet write into the
  * table's `data/` tree followed by ONE driver-side epoch commit —
  * an `appendCommit` keyed by the (queryId, epochId) txn marker, so
  * at-least-once epoch redelivery (kill/restart replay) lands each
  * epoch's data exactly once. `queryId` is the STABLE streaming query
  * id (persisted in the checkpoint; constant across restarts — runId
  * is the one that changes), exactly the key Delta's txn idempotence
  * uses. Concurrent batch INSERTs interleave safely: the epoch commit
  * rides the same optimistic-concurrency rebase loop as every append. */
class GraftStreamingWrite(base: String, queryId: String, schema: StructType,
                          conf: SerializableHadoopConf)
    extends StreamingWrite {
  private def spark = SparkSession.active
  /** Under a column mapping, staged files store PHYSICAL names — same
    * contract as the batch write path (r10). Row layout is positional,
    * so only the parquet field names change. */
  private def physSchema(s: StructType): StructType = {
    val v = TableFormat.latestVersion(spark, base)
    if (v == 0) s
    else {
      val cm = TableFormat.manifestColmap(spark, base, v)
      if (cm.isEmpty) s
      else StructType(s.fields.map(f => f.copy(name = cm.getOrElse(f.name, f.name))))
    }
  }
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // generated-column recompute (r11, ADVICE r10 medium): bound on the
    // LOGICAL schema (positional — the physical rename below changes
    // parquet field names, never ordinals)
    new GraftStreamingWriterFactory(s"$base/data/stream_$queryId", physSchema(schema), conf,
      GenerationProjection.forWrite(spark, base, schema),
      bucket = GraftWriterBucket.forWrite(spark, base, physSchema(schema)))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val paths = GraftStagedPaths.of(messages)
    val committed = TableFormat.exactlyOnceStagedEpoch(
      spark, base, queryId, epochId, paths, schema)
    if (committed.isEmpty && paths.nonEmpty) {
      // replayed epoch: the data is already in a committed manifest —
      // THIS attempt's staged files are duplicates. Best-effort delete
      // (vacuum reclaims any survivor: unreferenced files are invisible)
      val f = new HadoopPath(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
      paths.foreach(p => try f.delete(new HadoopPath(p), false) catch { case _: Exception => () })
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = new HadoopPath(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftStagedPaths.of(messages)
      .foreach(p => try f.delete(new HadoopPath(p), false) catch { case _: Exception => () })
  }
}

/** Bucket routing spec for the executor write paths (r12): (nBuckets,
  * key ordinal in the PHYSICAL write schema), or None when the table
  * declares no bucket layout, the key column is absent from this
  * write's schema, or its type is not integral. */
object GraftWriterBucket {
  def forWrite(spark: SparkSession, base: String,
               physSchema: StructType): Option[(Int, Int)] = {
    val v = TableFormat.latestVersion(spark, base)
    if (v == 0) return None
    val props =
      try TableFormat.manifestProps(spark, base, v)
      catch { case _: java.io.FileNotFoundException => return None }
    TableFormat.bucketSpecOf(props).flatMap { case (n, c) =>
      val cm = TableFormat.manifestColmap(spark, base, v)
      val phys = cm.getOrElse(c, c)
      val i = physSchema.fieldNames.indexOf(phys)
      val routable = i >= 0 && GraftBucketRouting.supported(physSchema.fields(i).dataType)
      if (routable) Some((n, i)) else None
    }
  }
}

/** Replacement batch write (r9, VERDICT r8 #2) — the write half of SQL
  * row-level rewrites (`MERGE INTO`, `UPDATE`, group-based `DELETE`):
  * Spark hands this write the post-operation contents of the files the
  * operation's scan READ; tasks stage parquet files, the driver
  * publishes them in one commit together with `carried` (r10, VERDICT
  * r9 #1) — the manifest entries the runtime group filter proved
  * untouched, re-entering by reference with their stats intact. Carried
  * is evaluated AT COMMIT TIME (a thunk): the runtime filter fires
  * during execution, after this Write is built. With an empty carried
  * set this is the full parentless replacement; prior versions stay
  * time-travel readable either way. */
class GraftReplaceWrite(base: String, schema: StructType,
                        conf: SerializableHadoopConf,
                        carried: () => Seq[TableFormat.ManifestEntry] =
                          () => Seq.empty,
                        basedOn: () => Option[Int] = () => None)
    extends Write with BatchWrite {
  private def spark = SparkSession.active
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // physical names under a column mapping (r10) — see GraftStreamingWrite
    val v = TableFormat.latestVersion(spark, base)
    val cm = if (v == 0) Map.empty[String, String]
             else TableFormat.manifestColmap(spark, base, v)
    val phys =
      if (cm.isEmpty) schema
      else StructType(schema.fields.map(f => f.copy(name = cm.getOrElse(f.name, f.name))))
    // generated-column recompute (r11, ADVICE r10 medium): an UPDATE/
    // MERGE touching a generated column's source must re-derive the
    // generated value — bound on the logical schema, positional
    new GraftBatchWriterFactory(
      s"$base/data/rl_${UUID.randomUUID.toString.take(8)}", phys, conf,
      GenerationProjection.forWrite(spark, base, schema),
      // bucketed tables keep their layout through MERGE/UPDATE/DELETE
      // rewrites (r12) — without this one row-level op demoted the
      // table off the storage-partitioned-join path until a rewrite
      bucket = GraftWriterBucket.forWrite(spark, base, phys))
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val paths = GraftStagedPaths.of(messages)
    // basedOn = the snapshot the operation scan read; a concurrent commit
    // since then means publishing would erase its rows — fail loudly
    // (TableFormat.ConcurrentModificationException), never silently win
    TableFormat.replaceCommitStaged(spark, base, paths, schema,
      carried = carried(), basedOnVersion = basedOn())
    ()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new HadoopPath(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftStagedPaths.of(messages)
      .foreach(p => try f.delete(new HadoopPath(p), false) catch { case _: Exception => () })
  }
}

/** Commit message of a MERGE-ON-READ delta task (r13, VERDICT r12 #2):
  * the post-image/insert data files the task staged plus (when it
  * deleted anything) its parquet file of raw (file_path, row_index)
  * deletion pairs. */
case class GraftDeltaMessage(dataPaths: Seq[String], dvPairPath: Option[String],
                             rows: Long) extends WriterCommitMessage

/** The write half of merge-on-read UPDATE/MERGE (r13, VERDICT r12 #2)
  * — Spark's DELTA-based row-level write ([[SupportsDelta]], the
  * Iceberg position-delta analog): instead of receiving the REPLACEMENT
  * contents of every touched file (copy-on-write, IO ∝ touched-file
  * bytes), each task receives per-row operations — delete(rowId),
  * insert(row) — and stages (a) raw deletion pairs and (b) post-image
  * parquet, so a scattered narrow UPDATE writes kilobytes where CoW
  * rewrites gigabytes. [[TableFormat.deltaCommitStaged]] publishes both
  * as ONE manifest version (superseding dv + appended files); bucketed
  * tables keep their layout (the insert side routes through the same
  * bucket writer as every other write path), and generated columns
  * recompute exactly like the CoW path. */
class GraftDeltaWrite(base: String, schema: StructType,
                      conf: SerializableHadoopConf,
                      basedOn: () => Option[Int], op: String)
    extends DeltaWrite with DeltaBatchWrite {
  private def spark = SparkSession.active
  override def toBatch: DeltaBatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    // physical names under a column mapping (r10) — see GraftReplaceWrite
    val v = TableFormat.latestVersion(spark, base)
    val cm = if (v == 0) Map.empty[String, String]
             else TableFormat.manifestColmap(spark, base, v)
    val phys =
      if (cm.isEmpty) schema
      else StructType(schema.fields.map(f => f.copy(name = cm.getOrElse(f.name, f.name))))
    val uid = UUID.randomUUID.toString.take(8)
    new GraftDeltaWriterFactory(
      s"$base/data/mor_$uid", s"$base/data/dvpairs_$uid", phys, conf,
      GenerationProjection.forWrite(spark, base, schema),
      GraftWriterBucket.forWrite(spark, base, phys))
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val data = messages.toSeq.flatMap {
      case GraftDeltaMessage(ps, _, _) => ps; case _ => Nil
    }
    val dv = messages.toSeq.flatMap {
      case GraftDeltaMessage(_, p, _) => p.toSeq; case _ => Nil
    }
    TableFormat.deltaCommitStaged(spark, base,
      basedOn().getOrElse(TableFormat.latestVersion(spark, base)), dv, data, op)
    ()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new HadoopPath(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.toSeq.foreach {
      case GraftDeltaMessage(ps, dvp, _) => (ps ++ dvp.toSeq).foreach(p =>
        try f.delete(new HadoopPath(p), false) catch { case _: Exception => () })
      case _ => ()
    }
  }
}

class GraftDeltaWriterFactory(dataDir: String, dvDir: String, schema: StructType,
                              conf: SerializableHadoopConf,
                              gen: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]],
                              bucket: Option[(Int, Int)])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaRowWriter(
      new GraftBatchWriterFactory(dataDir, schema, conf, gen, bucket)
        .createWriter(partitionId, taskId),
      s"$dvDir/pairs-p${partitionId}-${UUID.randomUUID.toString.take(8)}.parquet",
      conf)
}

/** Per-task delta writer: inserts/reinserts stream through the ordinary
  * staged-parquet writer (bucket-routed when the table declares a
  * layout); deletes stream straight into a raw (file_path, row_index)
  * parquet pair file — NO buffering, task memory O(1) in deleted-row
  * count. The id rows arrive in rowId() order (_file, _pos), exactly
  * the pair schema. */
class GraftDeltaRowWriter(insertW: DataWriter[InternalRow], dvFile: String,
                          conf: SerializableHadoopConf)
    extends DeltaWriter[InternalRow] {
  private val dvSchema = StructType(Seq(
    StructField(TableFormat.DvFileCol, StringType, nullable = false),
    StructField(TableFormat.DvPosCol, LongType, nullable = false)))
  private var dv: GraftParquetDataWriter = _
  private var nDel = 0L
  private var nIns = 0L
  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (dv == null) dv = new GraftParquetDataWriter(dvFile, dvSchema, conf)
    dv.write(id)
    nDel += 1
  }
  override def insert(row: InternalRow): Unit = { insertW.write(row); nIns += 1 }
  override def reinsert(meta: InternalRow, row: InternalRow): Unit = insert(row)
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }
  override def write(row: InternalRow): Unit = insert(row)
  override def commit(): WriterCommitMessage = {
    val dataMsg = insertW.commit()
    if (dv != null) dv.commit()
    GraftDeltaMessage(GraftStagedPaths.of(Array(dataMsg)),
      if (dv == null) None else Some(dvFile), nDel + nIns)
  }
  override def abort(): Unit = {
    insertW.abort()
    if (dv != null) dv.abort()
  }
  override def close(): Unit = ()
}
