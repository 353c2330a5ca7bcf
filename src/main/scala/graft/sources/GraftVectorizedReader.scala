package graft.sources

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized executor-side parquet reader for the table format's DSv2
  * row-returning scans (r14, VERDICT r13 #1) — replaces the
  * parquet-hadoop `example.Group` record materializer that backed the
  * streaming source, CoW/delta rewrite scans, CDF emit-mode, and
  * bucketed SPJ scans. Decode now runs through Spark's own
  * [[VectorizedParquetRecordReader]] (columnar page decode, dictionary
  * reuse, batched null handling); rows are served as the reader's
  * batch-row VIEW, so per-row cost is a position bump instead of a
  * `Group` object graph. At 100 TB these are exactly the paths every
  * UPDATE/MERGE rewrite and stream batch pays — several× per byte
  * cheaper than the row-materializing API.
  *
  * Semantics preserved exactly, pinned by the existing suites:
  *   - schema evolution: a column absent from an old file reads its
  *     EXISTS_DEFAULT (Spark's vectorized reader consumes the same
  *     `EXISTS_DEFAULT` field metadata this format stores) or NULL;
  *   - column mapping: the file is asked for PHYSICAL names (the
  *     requested schema is the logical schema renamed through the
  *     colmap — positional output, so logical ordering is unchanged);
  *   - type widening: a pre-widen file's narrower physical type
  *     up-casts in the column updaters (INT32→long/double,
  *     FLOAT→double — Spark's widening updater set);
  *   - deletion vectors: positions are FILE ordinals; the batch rows
  *     stream out in file order (one split = the whole file, no
  *     filters pushed, so no row-group skipping), and the wrapper
  *     counts ordinals and skips dv hits / emits CDF diff hits exactly
  *     as the row reader did;
  *   - appended metadata columns (`_file`, `_pos`, CDF type/version)
  *     join the data row through a reusable projection row.
  *
  * The one behavioral EXTENSION: types beyond the staged-writer set
  * (timestamps, decimals — files written by the V1 batch path) now
  * read instead of throwing, since the vectorized reader supports the
  * full parquet-spark surface. */
private[sources] class GraftVectorizedRowReader(
    part: GraftFilePartition, readSchema: StructType,
    conf: SerializableHadoopConf, appendFilePath: Boolean,
    appendRowPos: Boolean, colmap: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val file = part.file

  // requested schema: physical names (through the colmap), logical
  // types, field metadata (EXISTS_DEFAULT) intact
  private val physSchema = StructType(readSchema.fields.map(f =>
    f.copy(name = colmap.getOrElse(f.name, f.name))))

  private val reader: VectorizedParquetRecordReader =
    GraftVectorizedReaders.open(file, physSchema, conf.value,
      returnBatches = false)

  // deletion-vector positions for THIS file (r10): the dv dir is
  // positions-only and small, so each task reads it whole and keeps
  // its own file's ordinals; rows at those ordinals are skipped.
  private val deleted: graft.operators.DvRuns =
    part.dv.map(GraftDv.positions(conf.value, _, file)).orNull
  // CDF emit-mode (r10): produce ONLY the positions a merge-on-read
  // delete commit added to the dv — new runs minus old runs
  private val emitOnly: graft.operators.DvRuns =
    part.cdf.flatMap(_.emitDiffNew).map { nd =>
      val s = GraftDv.positions(conf.value, nd, file)
      part.cdf.flatMap(_.emitDiffOld)
        .map(od => s.minus(GraftDv.positions(conf.value, od, file)))
        .getOrElse(s)
    }.orNull

  // EQ-DELETE emit-mode (r16): produce ONLY the dv-live rows whose key
  // is in THIS commit's key set and not already masked by an earlier
  // outstanding delete — the same attribution the batch feed uses. A
  // key SPEC may be composite (comma-joined columns, r16): the probe
  // value is then the full tuple.
  private def eqIdxsOf(spec: String): Array[Int] =
    spec.split(',').map(c =>
      readSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c)))
  private val eqKeyIdxs: Array[Int] =
    part.cdf.flatMap(_.eqKeyCol).map(eqIdxsOf).getOrElse(Array.empty)
  // the new delete's key dir is always a plain per-batch set; earlier
  // dirs may be CONSOLIDATED (`eqc` prefix, r16) — their per-key stored
  // versions filter against this file's added-version, so only deletes
  // LATER than the file's add suppress emission (the exact scoping the
  // driver-side joins apply via the __eqv column)
  private val eqAv: Int = part.cdf.flatMap(_.eqAddedV).getOrElse(0)
  private val eqNewSet: java.util.HashSet[AnyRef] =
    part.cdf.flatMap(_.eqNewDir).map(d =>
      EqKeys.load(conf.value, d,
        eqKeyIdxs.map(readSchema.fields(_)).toSeq, eqAv)).orNull
  private val eqOldSets: Array[(Array[Int], java.util.HashSet[AnyRef])] =
    part.cdf.flatMap(_.eqOldPairs).map {
      _.split(graft.operators.DvLookup.DirSep).filter(_.nonEmpty).map { pair =>
        val Array(c, d) = pair.split('\t')
        val idxs = eqIdxsOf(c)
        (idxs, EqKeys.load(conf.value, d,
          idxs.map(readSchema.fields(_)).toSeq, eqAv))
      }
    }.getOrElse(Array.empty)

  /** The row's probe value for a key spec: the bare value for a single
    * column, a Vector for a composite tuple (element-wise equals, so
    * it probes the loaded sets directly); NULL in ANY component means
    * the row can never match a delete. */
  private def eqKeyOf(row: InternalRow, idxs: Array[Int]): AnyRef = {
    if (idxs.length == 1) {
      if (row.isNullAt(idxs(0))) null
      else row.get(idxs(0), readSchema.fields(idxs(0)).dataType).asInstanceOf[AnyRef]
    } else {
      val b = Vector.newBuilder[AnyRef]
      var i = 0
      while (i < idxs.length) {
        if (row.isNullAt(idxs(i))) return null
        b += row.get(idxs(i), readSchema.fields(idxs(i)).dataType).asInstanceOf[AnyRef]
        i += 1
      }
      b.result()
    }
  }

  private def eqEmit(row: InternalRow): Boolean = {
    val k = eqKeyOf(row, eqKeyIdxs)
    if (k == null) return false // NULL never matches a delete
    if (!eqNewSet.contains(k)) return false
    eqOldSets.forall { case (idxs, s) =>
      val ko = eqKeyOf(row, idxs)
      ko == null || !s.contains(ko)
    }
  }

  private def keep(o: Long): Boolean =
    if (eqNewSet != null)
      (deleted == null || !deleted.contains(o)) && eqEmit(current)
    else if (emitOnly != null) emitOnly.contains(o)
    else deleted == null || !deleted.contains(o)

  private val nExtra = (if (appendFilePath) 1 else 0) +
    (if (appendRowPos) 1 else 0) + (if (part.cdf.isDefined) 2 else 0)
  private val fileUtf8 = UTF8String.fromString(file)
  private val posAt = readSchema.length + (if (appendFilePath) 1 else 0)
  private val cdfAt = posAt + (if (appendRowPos) 1 else 0)

  private var ordinal: Long = -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    do {
      if (!reader.nextKeyValue()) { current = null; return false }
      current = reader.getCurrentValue.asInstanceOf[InternalRow]
      ordinal += 1
    } while (!keep(ordinal))
    true
  }

  override def get(): InternalRow = {
    // copy out of the batch view (the view mutates on next()); the
    // DSv2 row scan's consumers may buffer rows across next() calls
    val vals = new Array[Any](readSchema.length + nExtra)
    var i = 0
    while (i < readSchema.length) {
      vals(i) =
        if (current.isNullAt(i)) null
        else current.get(i, readSchema.fields(i).dataType) match {
          case s: UTF8String => s.copy() // batch-buffer view
          case v => v
        }
      i += 1
    }
    if (appendFilePath) vals(readSchema.length) = fileUtf8
    // `_pos` (r13): the row's FILE ordinal — the physical parquet row
    // index, NOT the post-dv-skip position — so (file, pos) is the
    // stable row id the merge-on-read delta write records
    if (appendRowPos) vals(posAt) = ordinal
    part.cdf.foreach { spec =>
      vals(cdfAt) = UTF8String.fromString(spec.changeType)
      vals(cdfAt + 1) = spec.version
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}

/** Shared construction of Spark's vectorized parquet reader for this
  * format's DSv2 scans — one place owns the conf keys, split shape, and
  * rebase modes for both the row-view and the true-columnar readers. */
private[sources] object GraftVectorizedReaders {
  def open(file: String, physSchema: StructType,
           hconf: org.apache.hadoop.conf.Configuration,
           returnBatches: Boolean): VectorizedParquetRecordReader = {
    val c = new org.apache.hadoop.conf.Configuration(hconf)
    c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    c.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, physSchema.json)
    // ParquetToSparkSchemaConverter / ParquetReadSupport read these
    // with NO defaults — every key must be present (ParquetFileFormat
    // sets the same five from the session conf)
    c.setBoolean("spark.sql.parquet.binaryAsString", false)
    c.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    c.setBoolean("spark.sql.caseSensitive", false)
    c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    val p = new HadoopPath(file)
    val len = p.getFileSystem(c).getFileStatus(p).getLen
    // the old-API FileSplit (it extends the mapreduce one): Spark's
    // reader base downcasts to it internally
    val split = new org.apache.hadoop.mapred.FileSplit(p, 0, len, Array.empty[String])
    val ctx = new TaskAttemptContextImpl(c, new TaskAttemptID())
    // no session timezone conversion (this format stores no INT96 and
    // its timestamp columns are adjusted-to-UTC micros); rebase modes
    // CORRECTED = read stored values as-is, the modern-file default
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    try {
      r.initialize(split, ctx)
      if (returnBatches) r.enableReturningBatches()
      r.initBatch(new StructType(), InternalRow.empty)
    } catch { case t: Throwable => r.close(); throw t }
    r
  }
}

/** TRUE-COLUMNAR partition reader (r14, phase 2 of the vectorized-read
  * work): for CLEAN partitions — no deletion vector, no CDF tagging, no
  * appended metadata columns — the scan hands Spark the decoder's
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es directly, so
  * downstream whole-stage codegen consumes columns with no per-row
  * materialization at all (the streaming source's and SPJ scan's common
  * case). Dirty partitions keep the row-view reader, which owns the
  * ordinal-tracking dv/CDF semantics; a scan opts into columnar ONLY
  * when every partition it plans is clean (Spark requires scan-uniform
  * row-vs-columnar mode). */
private[sources] class GraftColumnarReader(
    part: GraftFilePartition, readSchema: StructType,
    conf: SerializableHadoopConf, colmap: Map[String, String])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  require(part.dv.isEmpty && part.cdf.isEmpty,
    s"graft columnar read planned over a dirty partition (${part.file}) — " +
      "dv/CDF partitions must take the row-view reader")
  private val physSchema = StructType(readSchema.fields.map(f =>
    f.copy(name = colmap.getOrElse(f.name, f.name))))
  private val reader: VectorizedParquetRecordReader =
    GraftVectorizedReaders.open(part.file, physSchema, conf.value,
      returnBatches = true)
  override def next(): Boolean = reader.nextKeyValue()
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
    reader.getCurrentValue.asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
  override def close(): Unit = reader.close()
}

/** Executor-side EQUALITY-DELETE key-set loading for the streaming
  * change feed's eq emit-mode (r16): each task loads the commit's key
  * files — batch-sized by construction (`deleteByKeysEq` stores the
  * distinct key set) — into one HashSet of Catalyst-internal values
  * (UTF8String/boxed primitives, so row probes compare directly), via
  * the same vectorized parquet reader the data path uses (identical
  * type conversion). Bounded executor-global LRU, the DvLookup shape. */
private[sources] object EqKeys {
  private val MaxCached = 64
  private val cache =
    new java.util.LinkedHashMap[String, java.util.HashSet[AnyRef]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.HashSet[AnyRef]]): Boolean =
        size() > MaxCached
    }

  /** A consolidated key dir ([[graft.operators.TableFormat
    * .consolidateEqDeletes]], r16) carries per-key delete versions in a
    * `__eqv` column; `addedV` scopes the loaded set to the deletes that
    * apply to the PROBING FILE (deleteV > addedV). Plain per-batch dirs
    * ignore `addedV` — the planner already scoped them record-level.
    * COMPOSITE key specs (r16) load as Vectors of the column values
    * (element-wise equals, matching the reader's tuple probes). */
  def load(conf: org.apache.hadoop.conf.Configuration, dir: String,
           fields: Seq[org.apache.spark.sql.types.StructField],
           addedV: Int = 0): java.util.HashSet[AnyRef] = {
    val versioned = new HadoopPath(dir).getName.startsWith("eqc")
    val names = fields.map(_.name).mkString(",")
    val key =
      if (versioned) dir + " " + names + " @" + addedV
      else dir + " " + names
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) return hit
    val out = new java.util.HashSet[AnyRef]()
    val d = new HadoopPath(dir)
    val fs = d.getFileSystem(conf)
    val vIdx = fields.length
    val schema =
      if (versioned) StructType(fields :+
        org.apache.spark.sql.types.StructField("__eqv",
          org.apache.spark.sql.types.IntegerType))
      else StructType(fields)
    def valueAt(row: InternalRow, i: Int): AnyRef =
      row.get(i, fields(i).dataType) match {
        case s: UTF8String => s.copy() // batch-buffer view
        case v => v.asInstanceOf[AnyRef]
      }
    fs.listStatus(d).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val r = GraftVectorizedReaders.open(st.getPath.toString, schema, conf,
          returnBatches = false)
        try {
          while (r.nextKeyValue()) {
            val row = r.getCurrentValue.asInstanceOf[InternalRow]
            val anyNull = (0 until fields.length).exists(row.isNullAt)
            if (!anyNull &&
                (!versioned || (!row.isNullAt(vIdx) && row.getInt(vIdx) > addedV)))
              out.add(
                if (fields.length == 1) valueAt(row, 0)
                else (0 until fields.length).map(valueAt(row, _)).toVector)
          }
        } finally r.close()
      }
    cache.synchronized(cache.put(key, out))
    out
  }
}
