package graft.sources

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableFormat

/** `graft_table_changes(base, from[, to])` — the CHANGE DATA FEED as a
  * SQL table-valued function (r10, VERDICT r9 #4), the analog of
  * Delta's `table_changes(...)`: composes in any SELECT/JOIN/GROUP BY,
  * returning [[TableFormat.readChanges]]'s rows (table schema +
  * `_change_type` + `_commit_version`). `base` is the table's path, or
  * `db.t` resolved against the session's configured graft-catalog
  * warehouse; `to` defaults to the current version. Arguments must be
  * literals (resolved at analysis time — the TVF builder runs during
  * analysis, exactly like Spark's built-in `range(...)`). Registered in
  * the session TableFunctionRegistry by [[register]] (and by
  * `GraftExtensions` for sessions built with extensions). */
/** Shared argument/path resolution for the graft TVFs (r10): literal
  * evaluation and `db.t` → warehouse-path resolution must have exactly
  * one implementation across the changes/history/detail functions. */
private[sources] object GraftTvf {
  import org.apache.spark.sql.catalyst.expressions.Expression

  def evalStr(e: Expression): String = e.eval() match {
    case u: UTF8String => u.toString
    case other => String.valueOf(other)
  }
  def evalInt(name: String)(e: Expression): Int = e.eval() match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$name: expected an integer literal, got $other")
  }
  /** Resolve `db.t` through the graft catalog's warehouse when one is
    * configured and the argument isn't already a path. */
  def resolveBase(spark: SparkSession, s: String): String =
    if (s.contains("/")) s
    else {
      val wh = spark.conf.getOption("spark.sql.catalog.graft.warehouse")
      wh.fold(s)(w => (w +: s.split('.').toSeq).mkString("/"))
    }
}

object TableChangesTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_table_changes"



  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 2 || args.length == 3,
      s"$name(base, from[, to]) takes 2 or 3 arguments, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    // TIMESTAMP bounds (r13, the Delta table_changes timestamp form):
    // `from` resolves to the newest version AT OR BEFORE the instant —
    // the feed then carries exactly the changes committed AFTER it
    // ((from, to] semantics, same as the version form); a from-instant
    // predating the table yields the full retained history. `to` must
    // land at or after some snapshot, loudly otherwise.
    def bound(e: Expression, isFrom: Boolean): Int = e.dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        val tsMillis = e.eval(null).asInstanceOf[Long] / 1000L
        TableFormat.versionAtOrBefore(spark, base, tsMillis).getOrElse {
          if (isFrom) 0
          else throw new IllegalArgumentException(
            s"$name: no snapshot of $base at or before " +
              java.time.Instant.ofEpochMilli(tsMillis))
        }
      case _ => GraftTvf.evalInt(name)(e)
    }
    val from = bound(args(1), isFrom = true)
    val to =
      if (args.length == 3) bound(args(2), isFrom = false)
      else TableFormat.currentVersion(spark, base)
    SqlBridge.analyzed(TableFormat.readChanges(spark, base, from, to))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  /** Idempotent session-level registration. */
  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_table_history(base)` — `DESCRIBE HISTORY` as a composable TVF
  * (r10): one (version, op, n_files) row per retained version from the
  * manifest headers, queryable/joinable like any relation (Delta's
  * `DESCRIBE HISTORY` is a bespoke statement; a TVF composes). Pure
  * driver-side metadata (two small reads per version) surfaced as a
  * local relation — the audit an operator consults before
  * `CALL graft.system.vacuum/restore`. */
/** `graft_view_history(base)` — every definition a view ever had (r12):
  * archived versions + the current one, oldest first. Pure metadata
  * (one directory listing + the small descriptor files); what an
  * operator reads before `restore_view`. */
object ViewHistoryTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_view_history"

  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(base) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    val fs = new HadoopPath(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = GraftViews.read(fs, base).map(_.ver).getOrElse(
      throw new IllegalArgumentException(s"$name: no view at $base"))
    import spark.implicits._
    SqlBridge.analyzed(
      GraftViews.history(fs, base)
        .map(d => (d.ver, d.ver == cur, d.schema.fields.length, d.sql))
        .toDF("version", "is_current", "n_cols", "sql"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_mv_detail(base)` — the materialized view's freshness row
  * (r12): source table, the source version the MV has APPLIED vs the
  * source's CURRENT version (their gap IS the staleness), the state
  * table's own version, and the group count — all from manifests and
  * the view descriptor, zero data IO. What an operator reads before
  * deciding to `refresh_mv`. */
object MvDetailTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_mv_detail"

  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(base) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    val fs = new HadoopPath(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state =
      if (GraftViews.exists(fs, base)) s"${base}__state" else base
    val sv = TableFormat.currentVersion(spark, state)
    val props = TableFormat.manifestProps(spark, state, sv)
    // EVERY chain source (r16 N-table join MVs): `graft.mv.src` plus
    // `src2`, `src3`, … each with its own bookmark — one output ROW per
    // source, so staleness at ANY chain position is visible (a join
    // MV's exactness spans all of them)
    val srcRels = graft.operators.MaterializedView.mvSrcsOf(props)
    if (srcRels.isEmpty)
      throw new IllegalArgumentException(s"$name: $base is not a materialized view")
    val appliedVs = srcRels.indices.map { i =>
      (if (i == 0) props("graft.mv.version")
       else props(s"graft.mv.version${i + 1}")).toInt
    }
    // the MV's sources are stored RELATIVE (db.t) — resolve against
    // the warehouse CONTAINING this MV's own path, scanning every
    // registered graft catalog instead of assuming one named 'graft'
    // (r13, ADVICE r12 #4)
    val confs = spark.conf.getAll
    val warehouses = confs.toSeq.collect {
      case (k, v) if k.startsWith("spark.sql.catalog.") &&
          !k.stripPrefix("spark.sql.catalog.").contains(".") &&
          v == classOf[GraftCatalog].getName =>
        confs.get(s"$k.warehouse")
    }.flatten
    val wh = warehouses.find(w => base.startsWith(w.stripSuffix("/") + "/"))
      .orElse(warehouses.headOption)
    val nGroups = {
      val es = TableFormat.manifestEntries(spark, state, sv)
      if (es.forall(_.rows.isDefined)) es.flatMap(_.liveRows).sum else -1L
    }
    import spark.implicits._
    val perSrc = srcRels.zip(appliedVs).map { case (srcRel, applied) =>
      val srcBase = wh.map(w => (w +: srcRel.split('.').toSeq).mkString("/"))
        .getOrElse(srcRel)
      val srcCur = TableFormat.currentVersion(spark, srcBase)
      (srcRel, applied, srcCur, srcCur > applied, sv, nGroups)
    }
    // `serving` (r17, VERDICT r16 #3): would the query REWRITE's
    // freshness gate pass right now — every chain bookmark at its
    // source's head. The same fact graft_mv_explain reports as
    // would_serve/stale-bookmark, derivable here from pure metadata.
    val serving = perSrc.forall(!_._4)
    SqlBridge.analyzed(perSrc.map { case (s, a, c, st, v, n) =>
      (s, a, c, st, serving, v, n)
    }.toDF("src", "src_version_applied", "src_version_current",
      "stale", "serving", "state_version", "n_groups"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_mv_explain('<query sql>')` — the rewrite-miss EXPLAINER
  * (r17, VERDICT r16 #3): runs the MV rewrite's OWN probe chain against
  * the given query and reports, per candidate MV, either `would_serve`
  * or the FIRST standdown reason (stale-bookmark, dims-mismatch,
  * filter-mismatch, agg-unmatched/HLL++ standdown, join-keys-mismatch,
  * expr-dim-unmatched, residual-not-dim-only, …). Query-level
  * standdowns (shape, no candidates) come back as one row with mv NULL.
  * The `chosen` column marks the ONE candidate the rewrite would pick
  * (the first would_serve in smallest-state ranked order — the same
  * first-success walk the rewrite takes). The probes are the matcher's
  * own code path — the explainer cannot drift from what the rewrite
  * actually does. Driver-side metadata only; the query is analyzed but
  * never executed. */
object MvExplainTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CTERelationDef, Deduplicate, Distinct, LogicalPlan, Project}
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_mv_explain"

  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(sql) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val sql = GraftTvf.evalStr(args.head)
    val flagOpt = spark.conf.getOption("spark.graft.mv.rewrite")
    val flag = flagOpt.getOrElse("false")
    // analyze with the rewrite OFF: a fresh MV would otherwise already
    // have substituted the aggregate, leaving nothing to explain.
    // NOTE (r18, ADVICE r17 #2): the flag flip is session-global and not
    // thread-safe — a query analyzed CONCURRENTLY in the same session
    // during this window silently skips its MV rewrite (safe: it runs
    // the direct plan, just unrewritten). An originally-unset flag is
    // restored by UNSET, not pinned to an explicit "false".
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val analyzed =
      try spark.sessionState.executePlan(
        spark.sessionState.sqlParser.parsePlan(sql)).analyzed
      finally flagOpt match {
        case Some(v) => spark.conf.set("spark.graft.mv.rewrite", v)
        case None    => spark.conf.unset("spark.graft.mv.rewrite")
      }
    val cteDefs: Map[Long, LogicalPlan] =
      analyzed.collect { case d: CTERelationDef => d.id -> d.child }.toMap
    val rule = graft.plans.RewriteAggregateToMv(spark)
    // the same node shapes apply() serves: Aggregate, SELECT DISTINCT
    // (Distinct over Project), whole-output Deduplicate
    val probes: Seq[(Option[String], String, String, Boolean)] = analyzed.collect {
      case agg @ Aggregate(grouping, aggExprs, child, _) if agg.resolved =>
        rule.explainProbe(grouping, aggExprs, child, cteDefs)
      case d @ Distinct(Project(projList, child)) if d.resolved =>
        rule.explainProbe(
          projList.map {
            case org.apache.spark.sql.catalyst.expressions.Alias(e, _) => e
            case e => e },
          projList, child, cteDefs)
      case d @ Deduplicate(keys, child) if d.resolved &&
          org.apache.spark.sql.catalyst.expressions.AttributeSet(keys) ==
            child.outputSet =>
        rule.explainProbe(child.output, child.output, child, cteDefs)
    }.flatten
    val rows =
      (if (flag != "true")
         Seq((None: Option[String], "note",
           "spark.graft.mv.rewrite=false — rewrites are disabled; " +
             "probe results below assume the flag enabled", false))
       else Nil) ++
      (if (probes.isEmpty)
         Seq((None: Option[String], "standdown",
           "query-shape: no servable aggregate node (GROUP BY aggregate, " +
             "SELECT DISTINCT, or whole-row distinct) in the query", false))
       else probes)
    import spark.implicits._
    SqlBridge.analyzed(rows.map { case (mv, st, why, ch) =>
        (mv.orNull, st, why, ch) }
      .toDF("mv", "status", "reason", "chosen"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

object TableHistoryTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_table_history"


  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(base) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    import spark.implicits._
    SqlBridge.analyzed(
      TableFormat.history(spark, base).toDF("version", "op", "n_files"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_table_detail(base)` — `DESCRIBE DETAIL` as a composable TVF
  * (r10): ONE row of snapshot-level facts straight from metadata (the
  * manifest + file statuses; no data IO): current version, file and
  * deletion-vector counts, exact live row count when every entry
  * carries one, on-disk bytes, declared clustering columns, and the
  * table's property/constraint counts. What an operator reads before
  * choosing compact/vacuum/optimize parameters. */
object TableDetailTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_table_detail"


  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(base) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    val v = TableFormat.currentVersion(spark, base)
    val entries = TableFormat.manifestEntries(spark, base, v)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizeBytes = entries.map { e =>
      try fs.getFileStatus(new org.apache.hadoop.fs.Path(e.path)).getLen
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
    val liveRows: Option[Long] =
      if (entries.nonEmpty && entries.forall(_.rows.isDefined))
        Some(entries.flatMap(_.liveRows).sum)
      else if (entries.isEmpty) Some(0L)
      else None
    import spark.implicits._
    SqlBridge.analyzed(Seq((
      v,
      entries.size,
      entries.count(_.dv.isDefined),
      liveRows,
      sizeBytes,
      TableFormat.manifestStatsCols(spark, base, v).mkString(","),
      TableFormat.manifestProps(spark, base, v).size,
      TableFormat.manifestConstraints(spark, base, v).size,
      // outstanding equality deletes (r15): the operator signal that a
      // resolve_eqdel / compact is due — scans serve exactly meanwhile,
      // but without file skipping / agg pushdown / SPJ, and streams refuse
      TableFormat.manifestEqDels(spark, base, v).size
    )).toDF("version", "n_files", "n_dv_files", "live_rows", "size_bytes",
            "stats_cols", "n_props", "n_constraints", "n_eqdel"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_table_files(base[, version])` — the per-FILE inventory as a
  * composable TVF (r12): one row per manifest entry with its path,
  * footer row count, live rows (dv-adjusted), on-disk bytes, bucket id
  * (when the file belongs to a bucketed layout), dv pointer, and
  * whether the entry carries bounds for the first declared stats
  * column. `DESCRIBE DETAIL`'s drill-down: what an operator reads to
  * see WHICH files a compaction/optimize would touch, how skewed the
  * bucket layout is, or where dv-carrying files concentrate. Pure
  * metadata — one manifest read + one file-status per entry. */
object TableFilesTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_table_files"

  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.nonEmpty && args.length <= 2,
      s"$name(base[, version]) takes 1-2 arguments, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    val v =
      if (args.length == 2)
        args(1).eval(null).asInstanceOf[Number].intValue
      else TableFormat.currentVersion(spark, base)
    val entries = TableFormat.manifestEntries(spark, base, v)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    SqlBridge.analyzed(entries.map { e =>
      val bytes =
        try fs.getFileStatus(new org.apache.hadoop.fs.Path(e.path)).getLen
        catch { case _: java.io.FileNotFoundException => -1L }
      (e.path, e.rows, e.liveRows, bytes,
        TableFormat.bucketOfPath(e.path), e.dv, e.dvRows,
        // first declared key's bounds — NUMERIC slot for integral keys,
        // STRING slot (sext) for string keys (review r12: checking only
        // lo/hi reported a healthy lang-clustered index as broken)
        (e.lo.isDefined && e.hi.isDefined) ||
          (e.strStatsAt(0)._1.isDefined && e.strStatsAt(0)._2.isDefined))
    }.toDF("path", "rows", "live_rows", "size_bytes", "bucket",
           "dv_path", "dv_rows", "has_bounds"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_table_manifest(base)` — the commit LOG's physical shape as a
  * composable TVF (r13, delta-log observability): one row per live
  * version with its op, whether the manifest is a delta or a full
  * checkpoint, its chain depth, the edit-script size (entry count for
  * full manifests), the manifest's on-disk bytes, and the RESOLVED
  * snapshot entry count. What an operator reads to see metadata-write
  * amplification: a healthy log shows tiny delta bytes between full
  * checkpoints every [[graft.operators.TableFormat.CheckpointEvery]]
  * commits. Pure metadata — one small file read per version. */
object TableManifestTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_table_manifest"

  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(base) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    import spark.implicits._
    val rows = TableFormat.history(spark, base).map { case (v, op, _) =>
      val (isDelta, depth, body, bytes) = TableFormat.manifestLogStat(spark, base, v)
      val fmt = if (isDelta) "delta"
        else if (TableFormat.manifestIsParquet(spark, base, v)) "parquet-checkpoint"
        else "text"
      (v, op, isDelta, depth, fmt, body, bytes,
        TableFormat.manifestEntries(spark, base, v).size)
    }
    SqlBridge.analyzed(rows.toDF("version", "op", "is_delta", "delta_depth",
      "format", "script_lines", "manifest_bytes", "entries"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** `graft_table_branches(base)` — the branch listing as a composable
  * TVF (r11): one row per branch under `base/branches/` with its fork
  * version, current head version, and whether it has diverged from the
  * version it forked at (publishable = parent still AT the fork). Pure
  * metadata; what an operator reads before `publish`. */
object TableBranchesTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.graftbridge.SqlBridge

  val name = "graft_table_branches"

  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1, s"$name(base) takes 1 argument, got ${args.length}")
    val spark = SparkSession.active
    val base = GraftTvf.resolveBase(spark, GraftTvf.evalStr(args.head))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(s"$base/branches")
    val mainV = TableFormat.currentVersion(spark, base)
    val rows: Seq[(String, Int, Int, Int, Boolean)] =
      if (!fs.exists(bdir)) Seq.empty
      else fs.listStatus(bdir).toSeq.filter(_.isDirectory).flatMap { st =>
        val name = st.getPath.getName
        val bb = TableFormat.branchBaseOf(base, name)
        try {
          // shared parser: a rebased branch's _FORK is "parentV localV"
          val fork = TableFormat.readForkInfo(spark, bb)._1
          val head = TableFormat.currentVersion(spark, bb)
          Some((name, fork, head, mainV, mainV == fork))
        } catch { case _: java.io.FileNotFoundException => None }
      }.sortBy(_._1)
    import spark.implicits._
    SqlBridge.analyzed(rows
      .toDF("branch", "fork_version", "head_version", "table_version", "publishable"))
  }

  val info = new ExpressionInfo(getClass.getName, name)

  def register(spark: SparkSession): Unit =
    SqlBridge.registerTableFunction(spark, name, info, builder)
}

/** SQL maintenance verbs for graft tables (r10, VERDICT r9 #2) — Spark
  * 4's DSv2 stored-procedure API (`ProcedureCatalog` + `CALL`), the
  * route Delta exposes as `OPTIMIZE`/`VACUUM` and Iceberg as
  * `CALL catalog.system.…`: an operator at a SQL prompt can now
  * compact, vacuum, z-order, and restore a graft table with no Scala.
  *
  *   CALL graft.system.compact('db.t', 1048576, 2)
  *   CALL graft.system.vacuum('db.t', 2)
  *   CALL graft.system.optimize_zorder('db.t', 'a', 'b', 16)
  *   CALL graft.system.restore('db.t', 3)
  *
  * Each verb delegates to the table format's existing programmatic
  * operation (TableFormat.compact/vacuum/optimizeZorder/restoreVersion
  * — the single implementation of each protocol) and returns its result
  * as ONE driver-local row ([[LocalScan]]): maintenance moves table
  * METADATA plus bounded rewrite IO; the result set is audit numbers,
  * never data. All verbs are driver-side commits riding the same OCC
  * loop as every other commit — a concurrent writer can only cost a
  * retry, never corruption. */
object GraftProcedures {

  /** One maintenance verb: binds trivially (parameters are fixed), runs
    * against the catalog's warehouse, returns one audit row. */
  private abstract class Proc(procName: String, params: Seq[ProcedureParameter],
                              result: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // commits move state
    protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow
    /** Override when a verb needs a SECOND table path (clone). */
    protected def runWith(spark: SparkSession, warehouse: String, base: String,
                          input: InternalRow): InternalRow =
      run(spark, base, input)
    protected def tablePath(warehouse: String, table: String): String =
      (warehouse +: table.split('.').toSeq).mkString("/")
    final def callWith(warehouse: String): InternalRow => java.util.Iterator[Scan] = {
      input =>
        val spark = SparkSession.active
        val table = input.getUTF8String(0).toString
        val row = runWith(spark, warehouse, tablePath(warehouse, table), input)
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = result
        }).iterator()
    }
    // bound per-catalog in load(); the default is never used
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      throw new IllegalStateException(s"procedure $procName not bound to a catalog")
  }

  private def in(name: String, dt: DataType) = ProcedureParameter.in(name, dt).build()

  /** COMPACT: consolidate files under `small_bytes` into `target_files`
    * as a new commit. Returns (version, files_compacted). */
  private object CompactProc extends Proc("compact",
    Seq(in("table", StringType), in("small_bytes", LongType), in("target_files", IntegerType)),
    StructType(Seq(StructField("version", IntegerType), StructField("files_compacted", IntegerType)))) {
    override def description(): String =
      "rewrite files smaller than small_bytes into target_files consolidated files"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, n) = TableFormat.compact(spark, base, input.getLong(1), input.getInt(2))
      new GenericInternalRow(Array[Any](v, n))
    }
  }

  /** PREDICATE-SCOPED OPTIMIZE (r14) — `OPTIMIZE … WHERE` for the hot
    * range: rewrite only the files whose bounds intersect [lo, hi] on
    * the first clustering column; IO ∝ the range, not the table. */
  private object OptimizeWhereProc extends Proc("optimize_where",
    Seq(in("table", StringType), in("lo", LongType), in("hi", LongType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_rewritten", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "consolidate + re-cluster only the files intersecting [lo, hi] on the first clustering column"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, n, total) = TableFormat.optimizeWhere(
        spark, base, input.getLong(1), input.getLong(2))
      new GenericInternalRow(Array[Any](v, n, total))
    }
  }

  /** [[OptimizeWhereProc]] for STRING clustering keys (r14). */
  private object OptimizeWhereStrProc extends Proc("optimize_where_str",
    Seq(in("table", StringType), in("lo", StringType), in("hi", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_rewritten", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "consolidate + re-cluster only the files whose string bounds intersect [lo, hi]"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, n, total) = TableFormat.optimizeWhereStr(
        spark, base, input.getUTF8String(1).toString, input.getUTF8String(2).toString)
      new GenericInternalRow(Array[Any](v, n, total))
    }
  }

  /** 2-D PREDICATE-SCOPED OPTIMIZE (r15, VERDICT r14 #5) —
    * `optimize_where_box('db.t', lo1, hi1, lo2, hi2)`: rewrite only the
    * files whose recorded bounds intersect the box over BOTH declared
    * clustering columns — the maintenance analog of the z-order box
    * read; the box rows re-z-order with box-local grid bounds. */
  private object OptimizeWhereBoxProc extends Proc("optimize_where_box",
    Seq(in("table", StringType), in("lo1", LongType), in("hi1", LongType),
        in("lo2", LongType), in("hi2", LongType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_rewritten", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "consolidate + re-z-order only the files intersecting the [lo1,hi1]x[lo2,hi2] box on the two clustering columns"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, n, total) = TableFormat.optimizeWhereBox(spark, base,
        input.getLong(1), input.getLong(2), input.getLong(3), input.getLong(4))
      new GenericInternalRow(Array[Any](v, n, total))
    }
  }

  /** VACUUM: retain the last `retain_last` versions, physically delete
    * everything no retained manifest references. Returns
    * (files_deleted, files_kept). */
  /** READER-VS-VACUUM RETENTION FLOOR (r14, VERDICT r13 #6 — the Delta
    * retention-duration contract): a long-running reader plans its file
    * list from the version that was current at plan time; a concurrent
    * `vacuum`/`expire_snapshots` reclaiming that version mid-query
    * yanks its files. The SQL maintenance surface therefore refuses to
    * reclaim versions younger than `graft.vacuum.min-age` (table
    * property, ms; default 7 days — no running query outlives that).
    * Forced reclaim is explicit and LOUD: either declare a shorter
    * floor on the table, or set the session escape hatch
    * `spark.graft.vacuum.retentionCheck = false` (the Delta
    * retentionDurationCheck analog). The low-level
    * [[TableFormat.vacuum]] stays the explicit-retain primitive —
    * callers who hand-pick versions own their own retention. */
  private val DefaultVacuumMinAgeMs = 7L * 24 * 60 * 60 * 1000
  private def vacuumMinAge(spark: SparkSession, base: String): Long =
    (try TableFormat.manifestProps(spark, base,
        TableFormat.currentVersion(spark, base))
      catch { case _: Exception => Map.empty[String, String] })
      .get("graft.vacuum.min-age").flatMap(_.toLongOption)
      .getOrElse(DefaultVacuumMinAgeMs)
  private def retentionCheckOn(spark: SparkSession): Boolean =
    !spark.conf.getOption("spark.graft.vacuum.retentionCheck")
      .exists(_.equalsIgnoreCase("false"))

  private object VacuumProc extends Proc("vacuum",
    Seq(in("table", StringType), in("retain_last", IntegerType)),
    StructType(Seq(StructField("files_deleted", IntegerType), StructField("files_kept", IntegerType)))) {
    override def description(): String =
      "physically delete data files and manifests outside the last retain_last versions " +
        "(versions younger than graft.vacuum.min-age are always kept unless " +
        "spark.graft.vacuum.retentionCheck=false)"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val keep = input.getInt(1)
      require(keep >= 1, s"vacuum: retain_last must be >= 1 (got $keep)")
      val (deleted, kept) = TableFormat.vacuum(spark, base,
        retainedWindow(spark, base, keep))
      new GenericInternalRow(Array[Any](deleted, kept))
    }
  }

  /** The retained set `vacuum(retain_last)` resolves to — the last
    * `keep` versions that still exist ON DISK (a second vacuum's window
    * may reach past versions the first already dropped), plus every
    * version younger than the retention floor unless the session escape
    * hatch is set. Shared by [[VacuumProc]] and [[VacuumPreviewProc]]
    * so the preview predicts the real reclaim exactly. */
  private def retainedWindow(spark: SparkSession, base: String, keep: Int): Seq[Int] = {
    val cur = TableFormat.currentVersion(spark, base)
    val onDisk = TableFormat.history(spark, base).map(_._1)
    val window = onDisk.filter(v => v > cur - keep && v <= cur)
    if (!retentionCheckOn(spark)) window
    else {
      val floor = System.currentTimeMillis() - vacuumMinAge(spark, base)
      val hfs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (window ++ onDisk.filter { v =>
        try hfs.getFileStatus(new org.apache.hadoop.fs.Path(
          s"$base/_manifests/v$v.manifest")).getModificationTime >= floor
        catch { case _: java.io.FileNotFoundException => false }
      }).distinct.sorted
    }
  }

  /** VACUUM DRY RUN (r15) — `CALL graft.system.vacuum_preview('db.t', n)`:
    * what the same-argument vacuum WOULD reclaim (file count, bytes,
    * kept files, versions retained) under the identical retained-set
    * derivation, retention floor included. Nothing is deleted and no
    * metadata is written — the accounting an operator reads before
    * committing to a retention change (Delta VACUUM DRY RUN analog). */
  private object VacuumPreviewProc extends Proc("vacuum_preview",
    Seq(in("table", StringType), in("retain_last", IntegerType)),
    StructType(Seq(StructField("files_reclaimable", IntegerType),
                   StructField("bytes_reclaimable", LongType),
                   StructField("files_kept", IntegerType),
                   StructField("versions_retained", IntegerType),
                   StructField("eq_key_files_reclaimable", IntegerType),
                   StructField("eq_key_bytes_reclaimable", LongType)))) {
    override def description(): String =
      "report what vacuum(table, retain_last) would reclaim; deletes nothing"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val keep = input.getInt(1)
      require(keep >= 1, s"vacuum_preview: retain_last must be >= 1 (got $keep)")
      val retained = retainedWindow(spark, base, keep)
      val (n, bytes, kept, eqN, eqBytes) =
        TableFormat.vacuumPreview(spark, base, retained)
      new GenericInternalRow(Array[Any](n, bytes, kept, retained.size,
        eqN, eqBytes))
    }
  }

  /** OPTIMIZE ZORDER: rewrite the current snapshot clustered along the
    * (c1, c2) z-curve — CDF-silent, prior versions readable. Returns
    * (version, files_total). */
  private object OptimizeZorderProc extends Proc("optimize_zorder",
    Seq(in("table", StringType), in("c1", StringType), in("c2", StringType),
        in("n_files", IntegerType)),
    StructType(Seq(StructField("version", IntegerType), StructField("files_total", IntegerType)))) {
    override def description(): String =
      "rewrite the current snapshot z-ordered on (c1, c2) with per-file bounds on both"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val v = TableFormat.optimizeZorder(spark, base,
        input.getUTF8String(1).toString, input.getUTF8String(2).toString,
        nFiles = input.getInt(3))
      new GenericInternalRow(Array[Any](v, TableFormat.manifestEntries(spark, base, v).size))
    }
  }

  /** RESTORE: roll back to `version`'s contents as a new metadata-only
    * commit. Returns (restored_version, new_version). */
  private object RestoreProc extends Proc("restore",
    Seq(in("table", StringType), in("version", IntegerType)),
    StructType(Seq(StructField("restored_version", IntegerType), StructField("new_version", IntegerType)))) {
    override def description(): String =
      "re-publish version's file list as a new commit (metadata-only rollback)"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val target = input.getInt(1)
      val v = TableFormat.restoreVersion(spark, base, target)
      new GenericInternalRow(Array[Any](target, v))
    }
  }

  /** RESTORE TO TIMESTAMP (r14): resolve the instant to the newest
    * snapshot committed at or before it ([[TableFormat.versionAtOrBefore]]
    * — manifest mtimes are the commit instants, and since r14 vacuum's
    * materialization PRESERVES them, so the anchor survives maintenance)
    * and re-publish that version's file list as a new commit — the
    * Delta `RESTORE … TO TIMESTAMP AS OF` analog, metadata-only. */
  private object RestoreTsProc extends Proc("restore_ts",
    Seq(in("table", StringType), in("as_of", TimestampType)),
    StructType(Seq(StructField("restored_version", IntegerType), StructField("new_version", IntegerType)))) {
    override def description(): String =
      "metadata-only rollback to the newest snapshot committed at or before as_of"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val tsMillis = input.getLong(1) / 1000L // TimestampType internal = micros
      val target = TableFormat.versionAtOrBefore(spark, base, tsMillis).getOrElse(
        throw new IllegalArgumentException(
          s"restore_ts: no snapshot of $base at or before " +
            java.time.Instant.ofEpochMilli(tsMillis) +
            " — the earliest retained manifest is newer"))
      val v = TableFormat.restoreVersion(spark, base, target)
      new GenericInternalRow(Array[Any](target, v))
    }
  }

  /** SHALLOW CLONE: start `target` as a zero-copy reference to
    * `source`'s current snapshot (one manifest write; clone commits
    * never touch the source — the Delta SHALLOW CLONE analog as a
    * procedure). Returns (source_version, target_path). */
  private object CloneProc extends Proc("clone",
    Seq(in("source", StringType), in("target", StringType)),
    StructType(Seq(StructField("source_version", IntegerType),
                   StructField("target_path", StringType)))) {
    override def description(): String =
      "shallow-clone source's current snapshot as target's v1 (zero data copied)"
    override protected def run(spark: SparkSession, base: String,
                               input: InternalRow): InternalRow =
      throw new IllegalStateException("clone resolves two tables — runWith only")
    override protected def runWith(spark: SparkSession, warehouse: String,
                                   base: String, input: InternalRow): InternalRow = {
      val target = tablePath(warehouse, input.getUTF8String(1).toString)
      val srcV = TableFormat.cloneTable(spark, base, target)
      new GenericInternalRow(Array[Any](srcV, UTF8String.fromString(target)))
    }
  }

  /** ANALYZE (r11): rebuild the `#ndv` sketches exactly from the
    * current snapshot's live rows — the repair for the incremental
    * sketch's upper-bound drift after heavy deletes. Returns
    * (version, analyzed) where `analyzed` is `col=estimate` pairs. */
  private object AnalyzeProc extends Proc("analyze",
    Seq(in("table", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("analyzed", StringType)))) {
    override def description(): String =
      "rebuild per-column NDV sketches exactly from the current snapshot's live rows"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, est) = TableFormat.analyzeNdv(spark, base)
      new GenericInternalRow(Array[Any](v, UTF8String.fromString(
        est.toSeq.sortBy(_._1).map { case (c, n) => s"$c=$n" }.mkString(","))))
    }
  }

  /** BRANCH (r11): zero-copy fork of the table's current snapshot under
    * `base/branches/<name>` — addressable as `graft.db.t.branches.<name>`
    * for every SQL operation. Returns (fork_version, branch_ident). */
  private object BranchProc extends Proc("branch",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(StructField("fork_version", IntegerType),
                   StructField("branch", StringType)))) {
    override def description(): String =
      "fork the table's current snapshot as a zero-copy branch (write-audit-publish)"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val name = input.getUTF8String(1).toString
      val (_, forkV) = TableFormat.branchCreate(spark, base, name)
      new GenericInternalRow(Array[Any](forkV,
        UTF8String.fromString(s"branches.$name")))
    }
  }

  /** PUBLISH (r11): fast-forward the table to a branch's contents in one
    * metadata commit — refused if the table advanced since the fork.
    * Returns (published_version, files). */
  private object PublishProc extends Proc("publish",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(StructField("published_version", IntegerType),
                   StructField("files", IntegerType)))) {
    override def description(): String =
      "fast-forward the table to the branch's current contents (fails if diverged)"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val v = TableFormat.publishBranch(spark, base, input.getUTF8String(1).toString)
      new GenericInternalRow(Array[Any](v,
        TableFormat.manifestEntries(spark, base, v).size))
    }
  }

  /** DROP BRANCH (r13): reclaim a branch subtree — refuses while any
    * parent snapshot still references branch-tree files (publish shares
    * by reference). Returns (branch, files_deleted). */
  private object DropBranchProc extends Proc("drop_branch",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(StructField("branch", StringType),
                   StructField("files_deleted", LongType)))) {
    override def description(): String =
      "delete a branch's subtree; refused while the parent references its files"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val name = input.getUTF8String(1).toString
      val n = TableFormat.dropBranch(spark, base, name)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(s"branches.$name"), n))
    }
  }

  /** PURGE DV (r13): rewrite only the files whose deleted fraction
    * crossed the threshold into clean mask-free files (everything else
    * carries by reference) — Delta's REORG APPLY (PURGE). Returns
    * (version, purged_files, files_total). */
  private object PurgeDvProc extends Proc("purge_dv",
    Seq(in("table", StringType), in("min_fraction", DoubleType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("purged_files", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "materialize deletion vectors of dv-heavy files into clean rewrites"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val frac = if (input.isNullAt(1)) 0.10 else input.getDouble(1)
      val (v, purged, total) = TableFormat.purgeDv(spark, base, frac)
      new GenericInternalRow(Array[Any](v, purged, total))
    }
  }

  /** RESOLVE EQUALITY DELETES (r15, VERDICT r14 #4): fold every
    * outstanding equality-delete key file into ONE positional deletion
    * vector commit — the deferred join the O(batch) CDC ingest path
    * skipped, paid once for all batches since the last resolution.
    * compact/purge_dv run this automatically; the SQL scan and the
    * change feed name this procedure as the cure when they refuse an
    * outstanding-delete snapshot. Returns (version, resolved_deletes). */
  private object ResolveEqDelProc extends Proc("resolve_eqdel",
    Seq(in("table", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("resolved_deletes", IntegerType)))) {
    override def description(): String =
      "fold outstanding equality deletes into one positional deletion-vector commit"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, n) = TableFormat.resolveEqDeletes(spark, base)
      new GenericInternalRow(Array[Any](v, n))
    }
  }

  /** CONSOLIDATE EQUALITY DELETES (r16, r17 candidate #5): union each
    * key column's outstanding key files into ONE per-key-versioned file
    * — the cheaper middle step when full resolution is undesirable
    * mid-ingest: no table read, no dv commit, IO ∝ key bytes, and the
    * serving plan drops from |delete commits| key files to one per
    * column. Masks are semantically unchanged; `resolve_eqdel` remains
    * the real cure (and still runs automatically at compact/purge_dv).
    * Returns (version, consolidated_records). */
  private object ConsolidateEqDelProc extends Proc("consolidate_eqdel",
    Seq(in("table", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("consolidated_records", IntegerType)))) {
    override def description(): String =
      "union outstanding equality-delete key files into one per-key-versioned file per column"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, n) = TableFormat.consolidateEqDeletes(spark, base)
      new GenericInternalRow(Array[Any](v, n))
    }
  }

  /** PARTITION EVOLUTION (r13) — `CALL graft.system.set_clustering(
    * 'db.t', 'b,a')`, the Iceberg REPLACE PARTITION FIELD analog:
    * re-declares the clustering columns metadata-only. New writes
    * cluster and collect bounds the new way immediately; existing
    * entries' stats remap positionally, so pruning on columns present
    * in BOTH declarations never blinks, and newly-declared columns read
    * as unknown until a maintenance rewrite. Returns
    * (version, cols_carried). */
  private object SetClusteringProc extends Proc("set_clustering",
    Seq(in("table", StringType), in("columns", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("cols_carried", IntegerType)))) {
    override def description(): String =
      "re-declare the clustering columns metadata-only; shared columns keep their bounds"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val cols = input.getUTF8String(1).toString
        .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      val (v, carried) = TableFormat.setClustering(spark, base, cols)
      new GenericInternalRow(Array[Any](v, carried))
    }
  }

  /** EXPIRE SNAPSHOTS (r13) — TIME-BASED retention, the Iceberg
    * `expire_snapshots` / Delta `VACUUM ... RETAIN n HOURS` shape: the
    * retained set is every version whose manifest is YOUNGER than
    * `older_than_ms` plus the last `retain_last` versions (the current
    * version always survives — the core vacuum enforces it), and
    * everything else — superseded data files, orphans, old manifests —
    * physically reclaims through the same vacuum walk as the
    * count-based verb. Age comes from the manifest file's mtime: the
    * commit's publication instant, exactly what a retention SLA names.
    * Returns (files_deleted, versions_retained). */
  private object ExpireSnapshotsProc extends Proc("expire_snapshots",
    Seq(in("table", StringType), in("older_than_ms", LongType),
        in("retain_last", IntegerType)),
    StructType(Seq(StructField("files_deleted", IntegerType),
                   StructField("versions_retained", IntegerType)))) {
    override def description(): String =
      "physically delete snapshots older than older_than_ms, keeping the last retain_last"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val olderMs = input.getLong(1)
      val keepLast = if (input.isNullAt(2)) 1 else input.getInt(2)
      require(olderMs >= 0, s"expire_snapshots: older_than_ms must be >= 0 (got $olderMs)")
      require(keepLast >= 1, s"expire_snapshots: retain_last must be >= 1 (got $keepLast)")
      // retention floor (r14, VERDICT r13 #6): a sub-floor window could
      // reclaim a version a live reader planned from — refuse loudly,
      // naming both cures (the Delta retention-duration contract)
      if (retentionCheckOn(spark)) {
        val minAge = vacuumMinAge(spark, base)
        require(olderMs >= minAge,
          s"expire_snapshots: older_than_ms = $olderMs is below the table's " +
            s"retention floor graft.vacuum.min-age = $minAge — a reader planned " +
            "from a younger snapshot may still be running. Declare a shorter " +
            "floor via TBLPROPERTIES('graft.vacuum.min-age'='...') or force " +
            "with SET spark.graft.vacuum.retentionCheck=false")
      }
      val retained = expireRetained(spark, base, olderMs, keepLast)
      val (deleted, _) = TableFormat.vacuum(spark, base, retained)
      new GenericInternalRow(Array[Any](deleted, retained.size))
    }
  }

  /** The time-based retained set shared by [[ExpireSnapshotsProc]] and
    * [[ExpirePreviewProc]] (r16, VERDICT r15 #6): every version whose
    * manifest is younger than `older_than_ms`, plus the last
    * `retain_last` versions, plus the current one. One derivation — the
    * preview's counts and the real expire's cannot drift. */
  private def expireRetained(spark: SparkSession, base: String,
                             olderMs: Long, keepLast: Int): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$base/_manifests")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - olderMs
    val live = hfs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.endsWith(".manifest"))
        n.stripPrefix("v").stripSuffix(".manifest").toIntOption
          .map(_ -> st.getModificationTime)
      else None
    }.sortBy(_._1)
    val cur = TableFormat.currentVersion(spark, base)
    (live.filter(_._2 >= cutoff).map(_._1) ++
      live.map(_._1).takeRight(keepLast) :+ cur).distinct.sorted
  }

  /** EXPIRE DRY RUN (r16, VERDICT r15 #6) — `vacuum_preview`'s
    * time-based twin: what `expire_snapshots(table, older_than_ms,
    * retain_last)` WOULD reclaim under the identical retained-set
    * derivation ([[expireRetained]]) and the identical physical walk
    * ([[TableFormat.vacuumPreview]]). Nothing is deleted and no
    * metadata is written; the retention floor is NOT enforced here — a
    * dry run of a sub-floor window is exactly how an operator sizes a
    * retention change before committing to it. */
  private object ExpirePreviewProc extends Proc("expire_preview",
    Seq(in("table", StringType), in("older_than_ms", LongType),
        in("retain_last", IntegerType)),
    StructType(Seq(StructField("files_reclaimable", IntegerType),
                   StructField("bytes_reclaimable", LongType),
                   StructField("files_kept", IntegerType),
                   StructField("versions_retained", IntegerType),
                   StructField("eq_key_files_reclaimable", IntegerType),
                   StructField("eq_key_bytes_reclaimable", LongType)))) {
    override def description(): String =
      "report what expire_snapshots(table, older_than_ms, retain_last) would reclaim; deletes nothing"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val olderMs = input.getLong(1)
      val keepLast = if (input.isNullAt(2)) 1 else input.getInt(2)
      require(olderMs >= 0, s"expire_preview: older_than_ms must be >= 0 (got $olderMs)")
      require(keepLast >= 1, s"expire_preview: retain_last must be >= 1 (got $keepLast)")
      val retained = expireRetained(spark, base, olderMs, keepLast)
      val (n, bytes, kept, eqN, eqBytes) =
        TableFormat.vacuumPreview(spark, base, retained)
      new GenericInternalRow(Array[Any](n, bytes, kept, retained.size,
        eqN, eqBytes))
    }
  }

  /** REBASE (r13, VERDICT r12 #6): replay a diverged branch's commits
    * onto the parent's current head so publish can fast-forward again.
    * Append + merge-on-read commits replay position-stably; CoW
    * rewrites on the branch — or parent-side rewrites of files the
    * branch deleted from — refuse loudly. Returns
    * (branch_version, rebased_onto, replayed_commits). */
  private object RebaseProc extends Proc("rebase",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(StructField("branch_version", IntegerType),
                   StructField("rebased_onto", IntegerType),
                   StructField("replayed_commits", IntegerType)))) {
    override def description(): String =
      "replay a diverged branch onto the parent's current head (append/MoR commits only)"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (bv, pv, n) = TableFormat.rebaseBranch(spark, base,
        input.getUTF8String(1).toString)
      new GenericInternalRow(Array[Any](bv, pv, n))
    }
  }

  /** OPTIMIZE CLUSTER (r11): rewrite the snapshot hierarchically
    * range-clustered on ALL declared clustering columns (any number) —
    * the N-column complement of optimize_zorder. CDF-silent; NDV
    * rebuilds exactly. Returns (version, files_total). */
  private object OptimizeClusterProc extends Proc("optimize_cluster",
    Seq(in("table", StringType), in("n_files", IntegerType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "rewrite the current snapshot range-clustered on every declared clustering column"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val v = TableFormat.optimizeCluster(spark, base, nFiles = input.getInt(1))
      new GenericInternalRow(Array[Any](v,
        TableFormat.manifestEntries(spark, base, v).size))
    }
  }

  /** k-D Z-ORDER (r11): re-cluster along the interleaved curve over ALL
    * declared integral clustering columns (2..6) — a predicate on any
    * single column prunes, where hierarchical clustering mostly serves
    * the leading key. Returns (version, files_total). */
  private object OptimizeZorderNProc extends Proc("optimize_zorder_n",
    Seq(in("table", StringType), in("n_files", IntegerType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "rewrite the snapshot z-ordered across every declared integral clustering column"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val v = TableFormat.optimizeZorderN(spark, base, nFiles = input.getInt(1))
      new GenericInternalRow(Array[Any](v,
        TableFormat.manifestEntries(spark, base, v).size))
    }
  }

  /** INCREMENTAL OPTIMIZE (r12, VERDICT r11 #5): rewrite only files
    * VIOLATING the declared clustering (overlapping bounds, stat-less,
    * or under small_bytes); conforming files carry by reference — the
    * maintenance pass that stays affordable at 100 TB. Returns
    * (version, files_rewritten, files_total); a conforming snapshot is
    * a no-op (current version, 0 rewritten). */
  private object OptimizeIncrementalProc extends Proc("optimize_incremental",
    Seq(in("table", StringType), in("small_bytes", LongType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_rewritten", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "rewrite only files violating the declared clustering; carry the rest by reference"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, rw, tot) = TableFormat.optimizeIncremental(spark, base, input.getLong(1))
      new GenericInternalRow(Array[Any](v, rw, tot))
    }
  }

  /** CONVERT TO BUCKETED LAYOUT (r12): one commit that rewrites the
    * snapshot one-file-per-bucket and declares `graft.bucket` — the
    * on-ramp to storage-partitioned joins for an existing table.
    * Returns (version, files_total). */
  private object OptimizeBucketProc extends Proc("optimize_bucket",
    Seq(in("table", StringType), in("n_buckets", IntegerType),
        in("bucket_col", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("files_total", IntegerType)))) {
    override def description(): String =
      "rewrite the snapshot bucketed on bucket_col and declare graft.bucket atomically"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val v = TableFormat.optimizeBucket(spark, base, input.getInt(1),
        input.getUTF8String(2).toString)
      new GenericInternalRow(Array[Any](v,
        TableFormat.manifestEntries(spark, base, v).size))
    }
  }

  /** CREATE MATERIALIZED VIEW (r12): `CALL graft.system.create_mv(
    * 'db.mv', 'SELECT dims…, aggs… FROM graft.db.src [WHERE …] GROUP BY
    * dims')` — validates the IVM-maintainable shape, pins the source's
    * current version, and publishes the full aggregate + bookkeeping as
    * the MV's first commit ([[graft.operators.MaterializedView]]).
    * Returns (version, n_groups, src_version). */
  private object CreateMvProc extends Proc("create_mv",
    Seq(in("table", StringType), in("query", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("n_groups", LongType),
                   StructField("src_version", IntegerType)))) {
    override def description(): String =
      "create an incrementally-maintainable materialized view table from an aggregate query"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow =
      throw new IllegalStateException("create_mv binds via runWith")
    override protected def runWith(spark: SparkSession, warehouse: String,
                                   base: String, input: InternalRow): InternalRow = {
      val (v, n, sv) = graft.operators.MaterializedView.create(
        spark, warehouse, base, input.getUTF8String(1).toString)
      new GenericInternalRow(Array[Any](v, n, sv))
    }
  }

  /** REFRESH MATERIALIZED VIEW (r12): fold the source's CDF since the
    * bookmark into the MV — IO ∝ the change, never the source. Returns
    * (version, src_from, src_to, n_groups); n_groups = -1 means the
    * bookmark was already current (true no-op, no commit at all). */
  private object RefreshMvProc extends Proc("refresh_mv",
    Seq(in("table", StringType)),
    StructType(Seq(StructField("version", IntegerType),
                   StructField("src_from", IntegerType),
                   StructField("src_to", IntegerType),
                   StructField("n_groups", LongType),
                   StructField("n_regrouped", LongType)))) {
    override def description(): String =
      "incrementally refresh a materialized view from its source's change data feed"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow =
      throw new IllegalStateException("refresh_mv binds via runWith")
    override protected def runWith(spark: SparkSession, warehouse: String,
                                   base: String, input: InternalRow): InternalRow = {
      val (v, from, to, n, re) = graft.operators.MaterializedView.refresh(
        spark, warehouse, base)
      new GenericInternalRow(Array[Any](v, from, to, n, re))
    }
  }

  /** DROP MATERIALIZED VIEW (r12): removes the published view AND its
    * `__state` table as one logical object (dropping only the view would
    * orphan the state and block re-creation). Idempotent. */
  private object DropMvProc extends Proc("drop_mv",
    Seq(in("table", StringType)),
    StructType(Seq(StructField("dropped_view", BooleanType),
                   StructField("dropped_state", BooleanType)))) {
    override def description(): String =
      "drop a materialized view: its published view and its __state table together"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val (v, s) = graft.operators.MaterializedView.drop(spark, base)
      new GenericInternalRow(Array[Any](v, s))
    }
  }

  /** MV MAINTENANCE in one call (r18, VERDICT r17 #5):
    * `mv_maintain('db.mv', older_than_ms, retain_last)` compacts and
    * time-expires the MV's WHOLE physical footprint — the `__state`
    * table and every `__dict_*` sibling — so the per-refresh
    * full-state replace commits (and a streaming foreachBatch loop's
    * one-version-per-micro-batch cadence) don't accumulate manifests
    * and superseded files without bound. Compaction folds small state
    * files; expire keeps every version younger than `older_than_ms`
    * plus the last `retain_last` (same retained-set derivation and
    * retention-floor guard as `expire_snapshots`), so TIME TRAVEL
    * inside the declared window stays intact. The refresh bookmark
    * props ride the compact commit untouched (None-props commits
    * inherit the parent header verbatim). */
  private object MvMaintainProc extends Proc("mv_maintain",
    Seq(in("table", StringType), in("older_than_ms", LongType),
        in("retain_last", IntegerType)),
    StructType(Seq(StructField("tables_maintained", IntegerType),
                   StructField("files_compacted", IntegerType),
                   StructField("files_deleted", IntegerType),
                   StructField("versions_retained", IntegerType)))) {
    override def description(): String =
      "compact + expire a materialized view's state table and dictionary siblings in one call"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val olderMs = input.getLong(1)
      // NULL retain_last defaults to 3 — the SAME count the refresh-time
      // auto-policy (graft.mv.maintain.retain) defaults to, so both
      // entry points of mvMaintainCore keep identical version windows
      // (ADVICE r18 #2)
      val keepLast = if (input.isNullAt(2)) 3 else input.getInt(2)
      require(olderMs >= 0, s"mv_maintain: older_than_ms must be >= 0 (got $olderMs)")
      require(keepLast >= 1, s"mv_maintain: retain_last must be >= 1 (got $keepLast)")
      val (nt, compacted, deleted, retainedState) =
        GraftProcedures.mvMaintainCore(spark, base, Some(olderMs), keepLast)
      new GenericInternalRow(Array[Any](nt, compacted, deleted, retainedState))
    }
  }

  /** The ONE maintain implementation [[MvMaintainProc]] and the
    * refresh-time AUTO POLICY share (r18, r19 candidate #4 pulled
    * forward): compact + time-expire the state table and every dict
    * sibling. `olderMs = None` (the auto policy's default) resolves to
    * EACH table's own retention floor, so the floor check passes by
    * construction and time travel inside the declared window survives
    * unattended maintenance. Returns (tables, files_compacted,
    * files_deleted, state_versions_retained). */
  def mvMaintainCore(spark: SparkSession, mvBase: String,
                     olderMs: Option[Long], keepLast: Int): (Int, Int, Int, Int) = {
    val targets = graft.operators.MaterializedView.maintenanceTargets(spark, mvBase)
    var compacted = 0; var deleted = 0; var retainedState = 0
    targets.foreach { t =>
      val floor = vacuumMinAge(spark, t)
      val winMs = olderMs.getOrElse(floor)
      if (olderMs.isDefined && retentionCheckOn(spark))
        require(winMs >= floor,
          s"mv_maintain: older_than_ms = $winMs is below $t's retention " +
            s"floor graft.vacuum.min-age = $floor — declare a shorter floor " +
            "via TBLPROPERTIES or SET spark.graft.vacuum.retentionCheck=false")
      compacted += TableFormat.compact(spark, t, 64L << 20, 1)._2
      val retained = expireRetained(spark, t, winMs, keepLast)
      deleted += TableFormat.vacuum(spark, t, retained)._1
      if (t == targets.head) retainedState = retained.size
    }
    (targets.size, compacted, deleted, retainedState)
  }

  /** RESTORE VIEW (r12): republish an archived definition as the NEW
    * current version (never rewinds the version counter — the restore
    * itself is a versioned event, same discipline as table RESTORE).
    * Returns (restored_from, new_version). */
  private object RestoreViewProc extends Proc("restore_view",
    Seq(in("table", StringType), in("version", IntegerType)),
    StructType(Seq(StructField("restored_from", IntegerType),
                   StructField("new_version", IntegerType)))) {
    override def description(): String =
      "republish an archived view definition as the new current version"
    override protected def run(spark: SparkSession, base: String, input: InternalRow): InternalRow = {
      val fs = new HadoopPath(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val v = input.getInt(1)
      val d = GraftViews.readVersion(fs, base, v).getOrElse(
        throw new IllegalArgumentException(
          s"restore_view: no version $v at $base " +
            s"(have: ${GraftViews.history(fs, base).map(_.ver).mkString(", ")})"))
      require(GraftViews.exists(fs, base),
        s"restore_view: no current view at $base")
      GraftViews.write(fs, base, d, overwrite = true)
      val now = GraftViews.read(fs, base).map(_.ver).getOrElse(-1)
      new GenericInternalRow(Array[Any](v, now))
    }
  }

  private val all: Seq[Proc] =
    Seq(CompactProc, VacuumProc, VacuumPreviewProc, ExpireSnapshotsProc,
        ExpirePreviewProc, SetClusteringProc,
        OptimizeWhereProc, OptimizeWhereStrProc, OptimizeWhereBoxProc,
        RestoreTsProc,
      OptimizeZorderProc, RestoreProc, CloneProc,
      AnalyzeProc, BranchProc, PublishProc, RebaseProc, DropBranchProc,
      PurgeDvProc, ResolveEqDelProc, ConsolidateEqDelProc,
      OptimizeClusterProc,
      OptimizeZorderNProc, OptimizeIncrementalProc, OptimizeBucketProc,
      CreateMvProc, RefreshMvProc, DropMvProc, MvMaintainProc, RestoreViewProc)

  def names: Seq[String] = all.map(_.name())

  /** The procedure bound to `warehouse` — the UnboundProcedure the
    * catalog serves, whose bind() wires call() to the warehouse root. */
  def load(warehouse: String, name: String): Option[UnboundProcedure] =
    all.find(_.name() == name).map { p =>
      new UnboundProcedure {
        override def name(): String = p.name()
        override def description(): String = p.description()
        override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
          override def name(): String = p.name()
          override def description(): String = p.description()
          override def parameters(): Array[ProcedureParameter] = p.parameters()
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            p.callWith(warehouse)(input)
        }
      }
    }
}
