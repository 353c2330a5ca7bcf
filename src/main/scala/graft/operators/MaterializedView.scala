package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter, LogicalPlan, Project}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.GraftViews

/** Incremental MATERIALIZED VIEWS over snapshot tables (r12) — a small
  * incremental-view-maintenance (IVM) compiler on top of the table
  * format's change data feed.
  *
  * An MV is a REAL graft table (time travel, stats, vacuum, SQL reads
  * all apply) whose contents equal an aggregate query over a source
  * table, plus bookkeeping in table properties: the defining text
  * (`graft.mv.query`), the source (`graft.mv.src`), and the LAST
  * APPLIED source version (`graft.mv.version`). `refresh` reads ONLY
  * the source's CDF between the bookmarked version and its current one
  * — cost ∝ the change, not the 100 TB source — and folds the delta in:
  *
  *   Δ(group) = Σ sign(change) · contribution(row),  sign = +1 for
  *   insert/update_postimage, −1 for delete/update_preimage
  *
  * then one full-outer merge of |groups| rows republishes the MV with
  * the bookmark advanced IN THE SAME COMMIT (`appendCommit setProps`) —
  * a crashed refresh leaves either the old state with the old bookmark
  * or the new state with the new one, never a half.
  *
  * Supported shape (validated at CREATE, re-derived from the public IVM
  * literature on self-maintainable aggregates): `SELECT dims…, aggs…
  * FROM src [WHERE pred] GROUP BY dims` with COUNT(*) / COUNT(col) /
  * SUM(col) over INTEGRAL columns — exactly the self-maintainable
  * aggregates under insert AND delete. MIN/MAX are refused (not
  * self-maintainable under deletes without regrouping); float SUM is
  * refused (incremental accumulation order would drift vs recompute —
  * the engine-wide exact-arithmetic rule). Two hidden columns make the
  * maintenance EXACT, not approximate:
  *
  *  - `__cnt`: live contributing rows per group — a group whose count
  *    reaches 0 disappears from the MV (GROUP BY semantics);
  *  - `__n_<alias>` per SUM: non-null contributions — a sum whose
  *    non-null count reaches 0 reports NULL (SQL SUM semantics), which
  *    a bare "sum of signed values" would wrongly report as 0.
  */
object MaterializedView {

  sealed trait AggSpec { def alias: String }
  case class CountStar(alias: String) extends AggSpec
  case class CountCol(colName: String, alias: String) extends AggSpec
  case class SumCol(colName: String, alias: String) extends AggSpec

  case class MvDef(srcParts: Seq[String], dims: Seq[String],
                   aggs: Seq[AggSpec], filterSql: Option[String]) {
    def srcRelative: Seq[String] =
      if (srcParts.length >= 3) srcParts.takeRight(2) else srcParts
  }

  /** Parse + shape-validate the defining text. Refusals name the exact
    * unsupported construct — the contract is narrow on purpose. */
  def parseDef(spark: SparkSession, sql: String): MvDef = {
    def refuse(what: String): Nothing = throw new IllegalArgumentException(
      s"materialized view: $what — supported shape is SELECT dims…, " +
        "COUNT(*)/COUNT(col)/SUM(col) AS alias… FROM graft_table [WHERE pred] " +
        "GROUP BY dims (SUM/COUNT over integral columns; no DISTINCT, no " +
        "MIN/MAX, no expressions in GROUP BY, no joins)")
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val agg = plan match {
      case a: Aggregate => a
      case Project(_, _) => refuse("no GROUP BY found")
      case _ => refuse(s"top-level ${plan.nodeName} is not an aggregate")
    }
    val (srcParts, filterSql) = agg.child match {
      case r: UnresolvedRelation => (r.multipartIdentifier, None)
      case LFilter(cond, r: UnresolvedRelation) =>
        (r.multipartIdentifier, Some(cond.sql))
      case other => refuse(s"FROM must be a single table (got ${other.nodeName})")
    }
    val dims = agg.groupingExpressions.map {
      case a: UnresolvedAttribute => a.name
      case e => refuse(s"GROUP BY expression '${e.sql}' is not a plain column")
    }
    val aggs = agg.aggregateExpressions.flatMap {
      case a: UnresolvedAttribute =>
        if (!dims.contains(a.name)) refuse(
          s"output column '${a.name}' is neither a GROUP BY dim nor an aggregate")
        None // dim passthrough
      case Alias(f: UnresolvedFunction, alias) =>
        if (f.isDistinct) refuse(s"DISTINCT aggregate in '$alias'")
        val fn = f.nameParts.map(_.toLowerCase).mkString(".")
        (fn, f.arguments) match {
          case ("count", Seq(_: UnresolvedStar)) => Some(CountStar(alias))
          case ("count", Seq(Literal(1, _))) => Some(CountStar(alias))
          case ("count", Seq(c: UnresolvedAttribute)) => Some(CountCol(c.name, alias))
          case ("sum", Seq(c: UnresolvedAttribute)) => Some(SumCol(c.name, alias))
          case _ => refuse(s"aggregate '${f.nameParts.mkString(".")}' in '$alias'")
        }
      case Alias(e, alias) => refuse(s"output '$alias' = '${e.sql}' is not " +
        "a plain dim or a supported aggregate")
      case e => refuse(s"unaliased aggregate '${e.sql}' — every aggregate needs AS alias")
    }
    if (aggs.isEmpty) refuse("no aggregates")
    val dup = (dims ++ aggs.map(_.alias)).groupBy(identity).collectFirst {
      case (n, vs) if vs.length > 1 => n }
    dup.foreach(n => refuse(s"duplicate output column '$n'"))
    MvDef(srcParts, dims, aggs, filterSql)
  }

  private val CNT = "__cnt"
  private def nCol(a: String) = s"__n_$a"
  private def dCol(a: String) = s"__d_$a"
  private def dnCol(a: String) = s"__dn_$a"

  /** Integral-only guard for SUM/COUNT columns (exactness contract). */
  private def validateTypes(d: MvDef, srcSchema: StructType): Unit = {
    def fieldOf(c: String): StructField = srcSchema.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"materialized view: column $c is not in the source table schema"))
    (d.aggs.collect { case SumCol(c, _) => c } ++ d.dims).foreach(fieldOf)
    d.aggs.collect { case CountCol(c, _) => fieldOf(c); () }
    d.aggs.collect { case SumCol(c, a) =>
      fieldOf(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case dt => throw new IllegalArgumentException(
          s"materialized view: SUM($c) AS $a over ${dt.simpleString} — " +
            "incremental float accumulation drifts vs recompute; SUM is " +
            "integral-only (cast to a fixed-point integral column upstream)")
      }
    }
  }

  /** Full (re)computation of the MV state — used once at CREATE, and the
    * semantic definition the incremental path must match bit-for-bit. */
  def fullState(src: DataFrame, d: MvDef): DataFrame = {
    validateTypes(d, src.schema)
    val filtered = d.filterSql.map(src.where).getOrElse(src)
    val visible: Seq[Column] = d.aggs.map {
      case CountStar(a) => count(lit(1)).as(a)
      case CountCol(c, a) => count(col(c)).as(a)
      case SumCol(c, a) => sum(col(c).cast(LongType)).as(a)
    }
    val hidden: Seq[Column] = d.aggs.collect {
      case SumCol(c, a) => count(col(c)).as(nCol(a))
    } :+ count(lit(1)).as(CNT)
    val all = visible ++ hidden
    filtered.groupBy(d.dims.map(col): _*).agg(all.head, all.tail: _*)
  }

  /** Signed per-group delta from a CDF slice. */
  def deltaAggregate(changes: DataFrame, d: MvDef): DataFrame = {
    val signed = changes.withColumn("__sign",
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L)))
    val filtered = d.filterSql.map(signed.where).getOrElse(signed)
    val deltas: Seq[Column] = d.aggs.map {
      case CountStar(a) => sum(col("__sign")).as(dCol(a))
      case CountCol(c, a) =>
        sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L))).as(dCol(a))
      case SumCol(c, a) => sum(col(c).cast(LongType) * col("__sign")).as(dCol(a))
    }
    val hidden: Seq[Column] = d.aggs.collect {
      case SumCol(c, a) =>
        sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L))).as(dnCol(a))
    } :+ sum(col("__sign")).as(s"__d$CNT")
    val all = deltas ++ hidden
    filtered.groupBy(d.dims.map(col): _*).agg(all.head, all.tail: _*)
  }

  /** One full-outer merge of |groups| rows: state ⊕ delta, dead groups
    * dropped, all-null sums reported as NULL. */
  def merge(state: DataFrame, delta: DataFrame, d: MvDef): DataFrame = {
    val joined = state.join(delta, d.dims, "full_outer")
    def add(a: String, b: String): Column =
      coalesce(col(a), lit(0L)) + coalesce(col(b), lit(0L))
    val outAggs: Seq[Column] = d.aggs.map {
      case CountStar(a) => add(a, dCol(a)).as(a)
      case CountCol(c, a) => add(a, dCol(a)).as(a)
      case SumCol(c, a) =>
        when(add(nCol(a), dnCol(a)) > 0, add(a, dCol(a)))
          .otherwise(lit(null).cast(LongType)).as(a)
    }
    val outHidden: Seq[Column] = d.aggs.collect {
      case SumCol(_, a) => add(nCol(a), dnCol(a)).as(nCol(a))
    } :+ add(CNT, s"__d$CNT").as(CNT)
    joined
      .select((d.dims.map(col) ++ outAggs ++ outHidden): _*)
      .filter(col(CNT) > 0)
  }

  /** The user-visible projection (hidden bookkeeping columns dropped) —
    * what `graft_mv(...)`-style readers and the oracle compare. */
  def visibleColumns(d: MvDef): Seq[String] = d.dims ++ d.aggs.map(_.alias)

  // ---- procedures' entry points ------------------------------------

  private def srcPath(warehouse: String, d: MvDef): String =
    (warehouse +: d.srcRelative).mkString("/")

  /** The session catalog NAME serving `warehouse` — stored as the view
    * descriptor's resolution context so the MV's read surface resolves
    * from any session context. */
  private def catalogNameFor(spark: SparkSession, warehouse: String): String = {
    val confs = spark.conf.getAll
    confs.collectFirst {
      case (k, v) if k.startsWith("spark.sql.catalog.") &&
          !k.stripPrefix("spark.sql.catalog.").contains(".") &&
          v == classOf[graft.sources.GraftCatalog].getName &&
          confs.get(s"$k.warehouse").contains(warehouse) =>
        k.stripPrefix("spark.sql.catalog.")
    }.getOrElse(throw new IllegalArgumentException(
      s"materialized view: no graft catalog registered over warehouse $warehouse"))
  }

  /** The MV's physical STATE table sits beside the published name. */
  private def stateBase(mvBase: String): String = s"${mvBase}__state"

  /** Resolve the base a refresh operates on: the published name is a
    * VIEW over `<name>__state` (r12 surface), but a bare state table at
    * the name itself (the pre-view layout) still refreshes. */
  private def resolveState(spark: SparkSession, mvBase: String): String = {
    val fs = new org.apache.hadoop.fs.Path(mvBase)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (GraftViews.exists(fs, mvBase)) stateBase(mvBase) else mvBase
  }

  /** CREATE: pin the source's current version v0, publish the full
    * aggregate at v0 into the `__state` table (bookkeeping in the same
    * commit), then publish the MV's NAME as a stored VIEW projecting
    * only the user-declared columns — `SELECT … FROM graft.db.mv` shows
    * the clean aggregate schema while the liveness/null counters stay
    * an implementation detail of the state table (which remains fully
    * addressable: time travel, DESCRIBE DETAIL, vacuum).
    * Returns (mv_version, n_groups, src_version). */
  def create(spark: SparkSession, warehouse: String, mvBase: String,
             query: String): (Int, Long, Int) = {
    val d = parseDef(spark, query)
    val src = srcPath(warehouse, d)
    val fs = new org.apache.hadoop.fs.Path(mvBase)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sb = stateBase(mvBase)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$mvBase/_CURRENT")) ||
        fs.exists(new org.apache.hadoop.fs.Path(s"$sb/_CURRENT")) ||
        GraftViews.exists(fs, mvBase))
      throw new IllegalArgumentException(
        s"materialized view: $mvBase already exists — drop it first")
    val catName = catalogNameFor(spark, warehouse)
    val relParts = mvBase.stripPrefix(s"$warehouse/").split('/').toSeq
    val v0 = TableFormat.currentVersion(spark, src)
    val state = fullState(TableFormat.readSnapshot(spark, src, Some(v0)), d)
    val v = TableFormat.appendCommit(spark, sb, state,
      statsCol = None, setProps = Map(
        "graft.mv.query" -> query,
        "graft.mv.src" -> d.srcRelative.mkString("."),
        "graft.mv.version" -> v0.toString))
    // the published read surface: a stored view over the state table,
    // resolution pinned to this catalog (2-part name + stored context)
    val visible = visibleColumns(d)
    val stateRel = (relParts.init :+ s"${relParts.last}__state").mkString(".")
    val viewSchema = org.apache.spark.sql.types.StructType(
      state.schema.fields.filter(f => visible.contains(f.name)))
    GraftViews.write(fs, mvBase, GraftViews.Desc(
      sql = s"SELECT ${visible.mkString(", ")} FROM $stateRel",
      currentCatalog = catName,
      currentNamespace = Seq.empty,
      schemaJson = viewSchema.json,
      queryColumnNames = visible,
      columnAliases = Seq.empty,
      columnComments = Seq.empty,
      properties = Map("graft.mv" -> "true")), overwrite = false)
    val n = TableFormat.readSnapshot(spark, sb, Some(v)).count()
    (v, n, v0)
  }

  /** DROP: remove the published view AND the state table — the pair is
    * one logical object; dropping only the view would orphan the state
    * and block a re-create. Idempotent on a half-dropped MV. Returns
    * (dropped_view, dropped_state). */
  def drop(spark: SparkSession, mvBase: String): (Boolean, Boolean) = {
    val fs = new org.apache.hadoop.fs.Path(mvBase)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vDropped = GraftViews.drop(fs, mvBase)
    val sDropped = fs.delete(new org.apache.hadoop.fs.Path(stateBase(mvBase)), true)
    (vDropped, sDropped)
  }

  /** REFRESH: fold the source CDF from the bookmark to now into the MV.
    * Reads ONLY the changed versions' rows; a change-free span (or a
    * pure-maintenance span — compact/optimize emit no CDF rows) advances
    * the bookmark with a metadata-only commit. maxRetries = 0 on the
    * data commit: a concurrent refresh losing the manifest CAS must NOT
    * blindly re-publish its now-stale fold — it fails loudly for the
    * caller to re-run against the winner's state.
    * Returns (mv_version, src_from, src_to, n_groups). */
  def refresh(spark: SparkSession, warehouse: String,
              mvBase0: String): (Int, Int, Int, Long) = {
    val mvBase = resolveState(spark, mvBase0)
    val mvV = TableFormat.currentVersion(spark, mvBase)
    val props = TableFormat.manifestProps(spark, mvBase, mvV)
    val query = props.getOrElse("graft.mv.query",
      throw new IllegalArgumentException(
        s"materialized view: $mvBase carries no graft.mv.query — not an MV"))
    val fromV = props("graft.mv.version").toInt
    val d = parseDef(spark, query)
    val src = srcPath(warehouse, d)
    val toV = TableFormat.currentVersion(spark, src)
    require(toV >= fromV, s"materialized view: source $src moved BACKWARD " +
      s"($fromV -> $toV) — a restore rewrote applied history; re-create the MV")
    if (toV == fromV) return (mvV, fromV, toV, -1L)
    val delta = deltaAggregate(TableFormat.readChanges(spark, src, fromV, toV), d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (delta.isEmpty) {
        // maintenance-only span: bookmark advances, data untouched
        val v = TableFormat.alterPropsCommit(spark, mvBase,
          Map("graft.mv.version" -> toV.toString))
        (v, fromV, toV, 0L)
      } else {
        val state = TableFormat.readSnapshot(spark, mvBase, Some(mvV))
        val merged = merge(state, delta, d)
        val v = TableFormat.appendCommit(spark, mvBase, merged,
          statsCol = None, replace = true, maxRetries = 0,
          setProps = Map("graft.mv.version" -> toV.toString))
        val n = TableFormat.readSnapshot(spark, mvBase, Some(v)).count()
        (v, fromV, toV, n)
      }
    } finally { delta.unpersist(); () }
  }
}
