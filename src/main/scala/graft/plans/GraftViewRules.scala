package graft.plans

import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.sources.{GraftCatalog, GraftView, GraftViews}

/** SQL views over the graft catalog (r12).
  *
  * OSS Spark 4.1 ships the DSv2 `ViewCatalog` SPI with NO engine wiring:
  * `ResolveSessionCatalog` throws `UNSUPPORTED_FEATURE.CATALOG_OPERATION`
  * for any view DDL aimed at a non-session catalog — implementing the
  * SPI alone changes nothing, the analyzer must be extended (the public
  * Iceberg view-extension design, re-derived). Two rules, two injection
  * points, both registered by `GraftExtensions`:
  *
  *  - [[ResolveGraftViewDdl]] runs in the HINT-RESOLUTION batch — i.e.
  *    BEFORE the Resolution batch where `ResolveSessionCatalog` throws —
  *    and rewrites view DDL whose (still unresolved) identifier lands in
  *    a [[GraftCatalog]] into plain [[LeafRunnableCommand]]s; Spark's own
  *    command machinery executes them, no planner strategy needed.
  *  - [[ResolveGraftViews]] runs in the Resolution batch and expands an
  *    [[UnresolvedRelation]] naming a stored view into the view's
  *    ANALYZED plan: parse the stored text, QUALIFY relative table names
  *    against the view's CREATE-time catalog/namespace (so the text
  *    means the same tables from any session), then run a nested full
  *    analysis — which transparently handles CTEs/windows/nested views
  *    (the same nested-analysis trick v1 view resolution uses), with a
  *    thread-local expansion stack turning cycles into a loud error
  *    instead of analyzer divergence.
  *
  * A view read is therefore indistinguishable, by the end of analysis,
  * from the user having inlined the view text: filter pushdown, column
  * pruning, and the manifest's file-skipping index all apply unchanged —
  * and the view re-plans against CURRENT table state every read (late
  * binding; base-table schema evolution flows through).
  */
case class ResolveGraftViewDdl(spark: SparkSession) extends Rule[LogicalPlan] {

  import GraftViewCommands._
  import GraftViewRules._

  /** Root short-circuit (r13, VERDICT r12 perf #2): view DDL commands
    * are always the ROOT of their plan, and every Dataset construction
    * re-runs analysis — so for the overwhelmingly common non-DDL plan
    * this rule must cost ONE instanceof chain, not a full-tree
    * traversal with ten pattern matches per node. */
  private def isViewDdlRoot(p: LogicalPlan): Boolean = p match {
    case _: CreateView | _: DropView | _: DropTable | _: ShowViews |
         _: SetViewProperties | _: UnsetViewProperties | _: AlterViewAs |
         _: ShowTableProperties | _: DescribeRelation | _: ShowCreateTable |
         _: RenameTable => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!isViewDdlRoot(plan)) plan else plan.resolveOperatorsUp {
    case CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _, props,
        originalText, _, allowExisting, replace, _)
        if graftCatalogOf(spark, parts).isDefined =>
      val (gc, ident) = graftCatalogOf(spark, parts).get
      val text = originalText.getOrElse(throw new IllegalArgumentException(
        "graft views: CREATE VIEW requires the original query text"))
      val cm = spark.sessionState.catalogManager
      CreateGraftViewCommand(gc, ident, text,
        userCols.map(_._1), userCols.map(_._2.getOrElse("")),
        comment, props, allowExisting, replace,
        cm.currentCatalog.name, cm.currentNamespace.toSeq)

    case DropView(child, ifExists) if partsOf(child).exists(
        p => !isSessionTempView(spark, p) && graftCatalogOf(spark, p).isDefined) =>
      val (gc, ident) = graftCatalogOf(spark, partsOf(child).get).get
      DropGraftViewCommand(gc, ident, ifExists)

    // DROP TABLE aimed at a stored VIEW: refuse with the cure named
    // (the default path would report a confusing TABLE_NOT_FOUND)
    case DropTable(child, _, _) if partsOf(child).exists(
        p => GraftViewRules.resolveView(spark, p).isDefined) =>
      throw new UnsupportedOperationException(
        s"graft views: ${partsOf(child).get.mkString(".")} is a view — use DROP VIEW")

    case ShowViews(UnresolvedNamespace(parts, _), pattern, out)
        if graftNamespaceOf(spark, parts).isDefined =>
      val (gc, ns) = graftNamespaceOf(spark, parts).get
      ShowGraftViewsCommand(gc, ns, pattern, out)

    case SetViewProperties(child, props) if partsOf(child).exists(
        p => !isSessionTempView(spark, p) && graftCatalogOf(spark, p).isDefined) =>
      val (gc, ident) = graftCatalogOf(spark, partsOf(child).get).get
      SetGraftViewPropertiesCommand(gc, ident, props)

    case UnsetViewProperties(child, keys, _) if partsOf(child).exists(
        p => !isSessionTempView(spark, p) && graftCatalogOf(spark, p).isDefined) =>
      val (gc, ident) = graftCatalogOf(spark, partsOf(child).get).get
      UnsetGraftViewPropertiesCommand(gc, ident, keys)

    case AlterViewAs(child, originalText, _) if partsOf(child).exists(
        p => !isSessionTempView(spark, p) && graftCatalogOf(spark, p).isDefined) =>
      val (gc, ident) = graftCatalogOf(spark, partsOf(child).get).get
      val cm = spark.sessionState.catalogManager
      AlterGraftViewAsCommand(gc, ident, originalText,
        cm.currentCatalog.name, cm.currentNamespace.toSeq)

    // introspection: SHOW TBLPROPERTIES against a stored view
    case ShowTableProperties(child, propertyKey, out) if partsOf(child).exists(
        p => GraftViewRules.resolveView(spark, p).isDefined) =>
      val (gc, ident) = GraftViewRules.resolveView(spark, partsOf(child).get).get
      ShowGraftViewPropertiesCommand(gc, ident, propertyKey, out)

    // introspection: DESCRIBE / SHOW CREATE TABLE against a stored view
    case DescribeRelation(child, _, isExtended, out) if partsOf(child).exists(
        p => GraftViewRules.resolveView(spark, p).isDefined) =>
      val (gc, ident) = GraftViewRules.resolveView(spark, partsOf(child).get).get
      DescribeGraftViewCommand(gc, ident, isExtended, out)

    case ShowCreateTable(child, _, out) if partsOf(child).exists(
        p => GraftViewRules.resolveView(spark, p).isDefined) =>
      val (gc, ident) = GraftViewRules.resolveView(spark, partsOf(child).get).get
      ShowCreateGraftViewCommand(gc, ident, out)

    case RenameTable(child, newName, true) if partsOf(child).exists(
        p => !isSessionTempView(spark, p) && graftCatalogOf(spark, p).isDefined) =>
      val (gc, ident) = graftCatalogOf(spark, partsOf(child).get).get
      val cm = spark.sessionState.catalogManager
      val toParts =
        if (newName.length > 1 && newName.head.equalsIgnoreCase(gc.name)) newName.tail
        else if (newName.length > 1 && cm.isCatalogRegistered(newName.head))
          // a leading part naming a DIFFERENT registered catalog is a
          // cross-catalog rename, not a namespace inside this one
          throw new UnsupportedOperationException(
            s"graft views: RENAME across catalogs is not supported " +
              s"(${ident.namespace.mkString(".")}.${ident.name} -> ${newName.mkString(".")})")
        else newName
      val to =
        if (toParts.length == 1) Identifier.of(ident.namespace, toParts.head)
        else Identifier.of(toParts.init.toArray, toParts.last)
      RenameGraftViewCommand(gc, ident, to)
  }

  private def partsOf(child: LogicalPlan): Option[Seq[String]] = child match {
    case u: UnresolvedIdentifier => Some(u.nameParts)
    case u: UnresolvedView => Some(u.multipartIdentifier)
    case u: UnresolvedTableOrView => Some(u.multipartIdentifier)
    case _ => None
  }
}

/** Read-path expansion: `SELECT … FROM graft.db.v` (and nested views)
  * inline the stored text — see the class doc above. TOP-DOWN so the
  * write-refusal guards see the DML node while its target is still the
  * raw relation (bottom-up would expand the view first and surface a
  * confusing downstream error instead of the refusal). */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def viewName(p: LogicalPlan): Option[String] = {
    val rel = p match {
      case SubqueryAlias(_, child) => child // UPDATE t AS x / MERGE INTO t x
      case other => other
    }
    rel match {
      case u: UnresolvedRelation
          if GraftViewRules.resolveView(spark, u.multipartIdentifier).isDefined =>
        Some(u.multipartIdentifier.mkString("."))
      case _ => None
    }
  }

  private def refuse(op: String, name: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft views: $op on view $name is not allowed — views are read-only " +
        "(write to the underlying table)")

  /** Tree-pattern pruned (r13, VERDICT r12 perf #2): every case below
    * fires only on still-unresolved relations, and the pattern bitset
    * is cached per node — so the fully-resolved plans that dominate
    * re-analysis cost O(1) here instead of a traversal. Three targets
    * hide from a plain UNRESOLVED_RELATION probe: InsertIntoStatement
    * holds its table as a FIELD (only the query is a child, so the
    * target's bits never propagate), RelationTimeTravel is an
    * unresolved LEAF wrapping its relation (own RELATION_TIME_TRAVEL
    * bit), and UnresolvedWith must stay traversable so a CTE-wrapped
    * INSERT still reaches its guard. */
  private def shouldVisit(
      p: org.apache.spark.sql.catalyst.trees.TreePatternBits): Boolean =
    p.containsAnyPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.UNRESOLVED_RELATION,
      org.apache.spark.sql.catalyst.trees.TreePattern.RELATION_TIME_TRAVEL,
      org.apache.spark.sql.catalyst.trees.TreePattern.UNRESOLVED_WITH) ||
      p.isInstanceOf[InsertIntoStatement]

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDownWithPruning(shouldVisit) {
    case InsertIntoStatement(t, _, _, _, _, _, _) if viewName(t).isDefined =>
      refuse("INSERT", viewName(t).get)
    case UpdateTable(t, _, _) if viewName(t).isDefined =>
      refuse("UPDATE", viewName(t).get)
    case DeleteFromTable(t, _) if viewName(t).isDefined =>
      refuse("DELETE", viewName(t).get)
    case m: MergeIntoTable if viewName(m.targetTable).isDefined =>
      refuse("MERGE", viewName(m.targetTable).get)
    // `VERSION AS OF n` on a VIEW: serve the n-th stored DEFINITION
    // (current tables underneath — definitions version, data does not;
    // a timestamp clause is refused: view versions carry no wall-clock)
    case org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
        u: UnresolvedRelation, ts, ver)
        if GraftViewRules.resolveView(spark, u.multipartIdentifier).isDefined =>
      val name = u.multipartIdentifier.mkString(".")
      if (ts.isDefined) throw new UnsupportedOperationException(
        s"graft views: TIMESTAMP AS OF on view $name is not supported — view " +
          "versions are definition numbers (see graft_view_history); use VERSION AS OF")
      val v = ver.getOrElse(throw new UnsupportedOperationException(
        s"graft views: time travel on view $name needs VERSION AS OF")).toInt
      val (gc, ident) = GraftViewRules.resolveView(spark, u.multipartIdentifier).get
      GraftViewRules.viewPlan(spark, gc, ident, pinnedVersion = Some(v))

    // hot path: every unresolved relation in every query passes here —
    // ONE resolveView (one FS existence probe) per visit, with the
    // no-view case returning the node unchanged
    case u: UnresolvedRelation =>
      GraftViewRules.resolveView(spark, u.multipartIdentifier) match {
        case None => u
        case Some((gc, ident)) =>
          if (u.isStreaming) throw new UnsupportedOperationException(
            s"graft views: streaming read of view ${u.multipartIdentifier.mkString(".")} is not " +
              "supported — readStream the underlying table instead")
          GraftViewRules.viewPlan(spark, gc, ident)
      }
  }
}

object GraftViewRules {

  /** Resolve a multipart name to (graft catalog, identifier), mirroring
    * Spark's lookup order: leading part naming a registered catalog
    * wins; otherwise the current catalog (+ current namespace for
    * 1-part names). None when the catalog is not a [[GraftCatalog]]. */
  def graftCatalogOf(spark: SparkSession,
                     parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val (plugin, idParts) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    plugin match {
      case gc: GraftCatalog if idParts.nonEmpty =>
        val ident =
          if (idParts.length == 1) Identifier.of(cm.currentNamespace, idParts.head)
          else Identifier.of(idParts.init.toArray, idParts.last)
        Some((gc, ident))
      case _ => None
    }
  }

  /** Session temp views resolve FIRST for unqualified names — Spark's
    * own `ResolveSessionCatalog` order (r13, ADVICE r12 #1). Any guard
    * that would reroute a 1-part (or global_temp 2-part) name into a
    * stored-view command must stand down when the name is a temp view,
    * or the temp view could never be dropped/altered (or a same-named
    * stored view would be mutated instead). */
  def isSessionTempView(spark: SparkSession, parts: Seq[String]): Boolean =
    spark.sessionState.catalog.isTempView(parts)

  /** Like [[graftCatalogOf]] but additionally requires a STORED view,
    * and stands down for session temp views (temp-view-first). */
  def resolveView(spark: SparkSession,
                  parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    if (isSessionTempView(spark, parts)) None
    else graftCatalogOf(spark, parts).filter { case (gc, ident) => gc.viewExists(ident) }

  /** Resolve a (possibly catalog-qualified, possibly empty) namespace
    * reference to (graft catalog, namespace parts). */
  def graftNamespaceOf(spark: SparkSession,
                       parts: Seq[String]): Option[(GraftCatalog, Seq[String])] = {
    val cm = spark.sessionState.catalogManager
    val (plugin, ns) =
      if (parts.isEmpty) (cm.currentCatalog, cm.currentNamespace.toSeq)
      else if (cm.isCatalogRegistered(parts.head)) (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    plugin match {
      case gc: GraftCatalog => Some((gc, ns))
      case _ => None
    }
  }

  /** Qualify relative table names in a PARSED (unresolved) plan against
    * the view's stored resolution context: 1-part `t` → `cat.ns….t`
    * (unless a CTE named `t` is IN SCOPE — shadowing is scoped, so a
    * CTE defined inside a subquery does not hide an outer table of the
    * same name), 2-part `db.t` → `cat.db.t` (unless the head is itself
    * a registered catalog). Subquery expressions included, each carrying
    * its enclosing scope's CTE names. */
  def qualifyRelations(spark: SparkSession, plan: LogicalPlan,
                       cat: String, ns: Seq[String]): LogicalPlan = {
    val cm = spark.sessionState.catalogManager
    def qualifyName(u: UnresolvedRelation, ctes: Set[String]): UnresolvedRelation =
      if (u.multipartIdentifier.length == 1 &&
          !ctes.contains(u.multipartIdentifier.head.toLowerCase(Locale.ROOT)))
        u.copy(multipartIdentifier = (cat +: ns) ++ u.multipartIdentifier)
      else if (u.multipartIdentifier.length == 2 &&
          !cm.isCatalogRegistered(u.multipartIdentifier.head))
        u.copy(multipartIdentifier = cat +: u.multipartIdentifier)
      else u
    def walk(p: LogicalPlan, ctes: Set[String]): LogicalPlan = {
      val scoped = p match {
        case w: UnresolvedWith =>
          ctes ++ w.cteRelations.map(_._1.toLowerCase(Locale.ROOT))
        case _ => ctes
      }
      val here = p match {
        case u: UnresolvedRelation => qualifyName(u, scoped)
        case other => other.mapChildren(walk(_, scoped))
      }
      here.transformExpressions {
        case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          se.withNewPlan(walk(se.plan, scoped))
      }
    }
    walk(plan, Set.empty)
  }

  /** Expansion path of the CURRENT thread — nested views recurse through
    * [[analyzeInContext]]'s nested analysis, so a cycle re-enters
    * [[viewPlan]] for a key already on the stack and fails loudly
    * (instead of the analyzer spinning to its iteration cap). */
  private val expanding = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  /** Parse + qualify + NESTED-ANALYZE a view text in its stored context.
    * Full analysis (not subtree splicing) is what makes CTEs, windows,
    * ordinals, and nested views inside the text work without
    * re-implementing any analyzer machinery. */
  def analyzeInContext(spark: SparkSession, text: String,
                       cat: String, ns: Seq[String]): LogicalPlan = {
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    val qualified = qualifyRelations(spark, parsed, cat, ns)
    spark.sessionState.executePlan(qualified).analyzed
  }

  /** The fully expanded, aliased, SubqueryAlias-wrapped ANALYZED plan of
    * a stored view — the CURRENT definition, or (`pinnedVersion`) an
    * archived one. */
  def viewPlan(spark: SparkSession, gc: GraftCatalog, ident: Identifier,
               pinnedVersion: Option[Int] = None): LogicalPlan = {
    val key = (gc.name +: ident.namespace.toSeq :+ ident.name).mkString(".")
    val stack = expanding.get()
    if (stack.contains(key)) throw new IllegalStateException(
      s"graft views: recursive view $key " +
        s"(expansion path: ${(key :: stack).reverse.mkString(" -> ")})")
    val d = pinnedVersion match {
      case None => gc.loadView(ident).asInstanceOf[GraftView].desc
      case Some(v) => gc.loadViewVersion(ident, v)
    }
    expanding.set(key :: stack)
    val analyzed =
      try analyzeInContext(spark, d.sql, d.currentCatalog, d.currentNamespace)
      finally expanding.set(stack)
    val aliased =
      if (d.columnAliases.nonEmpty && d.columnAliases != d.queryColumnNames) {
        if (analyzed.output.length != d.columnAliases.length)
          throw new IllegalStateException(
            s"graft views: $key now produces ${analyzed.output.length} columns but " +
              s"was created with ${d.columnAliases.length} aliases — recreate the view")
        Project(analyzed.output.zip(d.columnAliases).map {
          case (attr, a) => Alias(attr, a)()
        }, analyzed)
      } else analyzed
    SubqueryAlias(gc.name +: ident.namespace.toSeq :+ ident.name, aliased)
  }

  /** CREATE-time resolution of the stored text in its stored context
    * ALONE — doubles as the self-containment check: a reference that
    * only resolves through a session temp view fails here (relative
    * names were qualified away from the temp-view namespace), refusing
    * the CREATE instead of storing a view that dies with the session —
    * the v1 `INVALID_TEMP_OBJ_REFERENCE` contract. */
  def resolveViewText(spark: SparkSession, text: String,
                      cat: String, ns: Seq[String]): LogicalPlan =
    try analyzeInContext(spark, text, cat, ns)
    catch {
      case e: IllegalStateException => throw e // recursive-view loop: already precise
      case e: Exception => throw new IllegalArgumentException(
        "graft views: view text is not self-contained — it must resolve from " +
          s"stored catalog context '$cat${ns.mkString(".", ".", "")}' without session " +
          s"temp views (${e.getMessage})", e)
    }
}

/** The view DDL commands — plain [[LeafRunnableCommand]]s so Spark's own
  * command machinery executes them; storage delegates to the catalog's
  * [[ViewCatalog]] SPI (atomic `_VIEW` publication in [[GraftViews]]). */
object GraftViewCommands {

  case class CreateGraftViewCommand(
      catalog: GraftCatalog, ident: Identifier, viewText: String,
      aliases: Seq[String], colComments: Seq[String],
      comment: Option[String], props: Map[String, String],
      allowExisting: Boolean, replace: Boolean,
      currentCatalog: String, currentNamespace: Seq[String])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val analyzed = GraftViewRules.resolveViewText(
        spark, viewText, currentCatalog, currentNamespace)
      if (aliases.nonEmpty && aliases.length != analyzed.output.length)
        throw new IllegalArgumentException(
          s"graft views: ${aliases.length} column aliases for a " +
            s"${analyzed.output.length}-column query")
      val outNames = analyzed.output.map(_.name)
      val schema = StructType(analyzed.schema.fields.zipWithIndex.map {
        case (f, i) => if (aliases.nonEmpty) f.copy(name = aliases(i)) else f
      })
      val allProps = props ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
      val info = new ViewInfo(ident, viewText, currentCatalog,
        currentNamespace.toArray, schema, outNames.toArray,
        aliases.toArray, colComments.toArray, allProps.asJava)
      if (replace) catalog.replaceView(info, true)
      else if (catalog.viewExists(ident)) {
        if (!allowExisting) throw new ViewAlreadyExistsException(ident)
      } else catalog.createView(info)
      Seq.empty
    }
  }

  case class DropGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
      ifExists: Boolean) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val dropped = catalog.dropView(ident)
      if (!dropped && !ifExists) throw new NoSuchViewException(ident)
      Seq.empty
    }
  }

  case class ShowGraftViewsCommand(catalog: GraftCatalog, ns: Seq[String],
      pattern: Option[String], override val output: Seq[Attribute])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val names = catalog.listViews(ns: _*).map(_.name).toSeq.sorted
      val kept = pattern.map(p => StringUtils.filterPattern(names, p)).getOrElse(names)
      kept.map(n => Row(ns.mkString("."), n, false))
    }
  }

  case class SetGraftViewPropertiesCommand(catalog: GraftCatalog,
      ident: Identifier, props: Map[String, String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.connector.catalog.ViewChange
      catalog.alterView(ident,
        props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) }: _*)
      Seq.empty
    }
  }

  case class UnsetGraftViewPropertiesCommand(catalog: GraftCatalog,
      ident: Identifier, keys: Seq[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.connector.catalog.ViewChange
      catalog.alterView(ident, keys.map(ViewChange.removeProperty): _*)
      Seq.empty
    }
  }

  /** ALTER VIEW … AS: replaces the stored text/schema, KEEPS the view's
    * properties (properties live on the view object, not its query). */
  case class AlterGraftViewAsCommand(catalog: GraftCatalog, ident: Identifier,
      newText: String, currentCatalog: String, currentNamespace: Seq[String])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val analyzed = GraftViewRules.resolveViewText(
        spark, newText, currentCatalog, currentNamespace)
      val old = catalog.loadView(ident).asInstanceOf[GraftView].desc
      val info = new ViewInfo(ident, newText, currentCatalog,
        currentNamespace.toArray, StructType(analyzed.schema.fields),
        analyzed.output.map(_.name).toArray,
        Array.empty, Array.empty, old.properties.asJava)
      catalog.replaceView(info, false)
      Seq.empty
    }
  }

  case class RenameGraftViewCommand(catalog: GraftCatalog, from: Identifier,
      to: Identifier) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      catalog.renameView(from, to)
      Seq.empty
    }
  }

  /** SHOW TBLPROPERTIES on a view: the stored user properties (a named
    * key answers just that key, absent → the v1-style error row shape
    * is skipped in favor of an empty result). */
  case class ShowGraftViewPropertiesCommand(catalog: GraftCatalog,
      ident: Identifier, propertyKey: Option[String],
      override val output: Seq[Attribute]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val props = catalog.loadView(ident).asInstanceOf[GraftView].desc.properties
      propertyKey match {
        case Some(k) => props.get(k).map(v => Row(k, v)).toSeq
        case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
      }
    }
  }

  /** DESCRIBE [EXTENDED] on a view: column rows from the STORED schema
    * (the view's contract), plus — extended — the v1-style
    * `# View Information` block with the defining text and its
    * resolution context. */
  case class DescribeGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
      isExtended: Boolean, override val output: Seq[Attribute])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val v = catalog.loadView(ident).asInstanceOf[GraftView]
      val d = v.desc
      val cols = d.schema.fields.zipWithIndex.map { case (f, i) =>
        val comment = d.columnComments.lift(i).filter(_.nonEmpty).orNull
        Row(f.name, f.dataType.simpleString, comment)
      }.toSeq
      if (!isExtended) cols
      else cols ++ Seq(
        Row("", "", null: String),
        Row("# View Information", "", null: String),
        Row("View Text", d.sql, null: String),
        Row("View Catalog and Namespace",
          (d.currentCatalog +: d.currentNamespace).mkString("."), null: String),
        Row("View Query Output Columns",
          d.queryColumnNames.mkString("[", ", ", "]"), null: String))
    }
  }

  /** SHOW CREATE TABLE on a view: reconstruct the CREATE VIEW statement
    * from the stored descriptor (aliases, properties, text). */
  case class ShowCreateGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
      override val output: Seq[Attribute]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val v = catalog.loadView(ident).asInstanceOf[GraftView]
      val d = v.desc
      val name = (catalog.name +: ident.namespace.toSeq :+ ident.name).mkString(".")
      val colList =
        if (d.columnAliases.nonEmpty && d.columnAliases != d.queryColumnNames)
          d.columnAliases.mkString(" (", ", ", ")")
        else ""
      val props = d.properties.filterNot(_._1 == ViewCatalog.PROP_COMMENT)
      val tbl =
        if (props.isEmpty) ""
        else props.toSeq.sortBy(_._1)
          .map { case (k, p) => s"'$k' = '$p'" }
          .mkString("\nTBLPROPERTIES (", ", ", ")")
      val comment = d.properties.get(ViewCatalog.PROP_COMMENT)
        .map(c => s"\nCOMMENT '$c'").getOrElse("")
      Seq(Row(s"CREATE VIEW $name$colList$comment$tbl AS\n${d.sql}"))
    }
  }
}
