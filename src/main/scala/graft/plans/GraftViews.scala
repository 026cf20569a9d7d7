package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier,
  UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView,
  UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView,
  LogicalPlan, RenameTable, SetViewProperties, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog,
  ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.sources.GraftCatalog

/** SQL views on the custom catalog [EXT] — the wiring Spark 4.1 does
  * NOT ship: the `ViewCatalog` connector API exists, but no analyzer
  * rule calls it (`ResolveSessionCatalog` rejects every view command
  * aimed at a non-session catalog, and nothing resolves a stored view
  * back into a plan). This is exactly the gap Iceberg fills with its
  * own session extensions, and this rule does the same for
  * [[GraftCatalog]]:
  *
  *  - It is injected as a HINT-resolution rule, the batch that runs
  *    BEFORE the Resolution batch — the view commands are intercepted
  *    while their identifiers are still syntactic, winning the race
  *    against `ResolveSessionCatalog`'s rejection.
  *  - `CREATE [OR REPLACE] VIEW`, `DROP VIEW`, `SHOW VIEWS`,
  *    `ALTER VIEW ... SET TBLPROPERTIES`, and `ALTER VIEW ... RENAME`
  *    rewrite to leaf commands that run against the [[ViewCatalog]].
  *  - A table reference that names a stored view substitutes the
  *    view's stored SQL, re-parsed in place (`SubqueryAlias` keeps the
  *    name for column qualification). Views re-resolve against CURRENT
  *    table state on every read — the governance property that lets a
  *    curated interface evolve without rewriting data. Nested views
  *    substitute recursively across fixed-point passes; a cyclic
  *    definition is caught by the analyzer's iteration limit.
  *
  * Unqualified table names in the view body resolve against the
  * DEFINITION context (the creator's current catalog/namespace,
  * persisted with the view and re-applied at substitution) — the same
  * contract Spark's own View node and the Iceberg view spec honor. */
case class GraftViewRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViews._

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, Some(text), _, allowExisting, replace, _)
        if isGraft(spark, parts) =>
      require(cols.isEmpty,
        "graft views do not support explicit column lists")
      GraftCreateViewCommand(parts, text, comment, props,
        allowExisting, replace)

    case DropView(UnresolvedIdentifier(parts, _), ifExists)
        if isGraft(spark, parts) =>
      GraftDropViewCommand(parts, ifExists)

    case ShowViews(UnresolvedNamespace(parts, _), pattern, output)
        if parts.nonEmpty && isGraft(spark, parts :+ "x") =>
      GraftShowViewsCommand(parts, pattern, output)

    case SetViewProperties(UnresolvedView(parts, _, _, _), props)
        if isGraft(spark, parts) &&
          catalogOf(spark, parts.head).exists(_.viewExists(identOf(parts))) =>
      GraftSetViewPropertiesCommand(parts, props)

    case org.apache.spark.sql.catalyst.plans.logical.UnsetViewProperties(
          UnresolvedView(parts, _, _, _), keys, ifExists)
        if isGraft(spark, parts) &&
          catalogOf(spark, parts.head).exists(_.viewExists(identOf(parts))) =>
      GraftUnsetViewPropertiesCommand(parts, keys, ifExists)

    case RenameTable(UnresolvedTableOrView(parts, _, _), newName, true)
        if isGraft(spark, parts) &&
          catalogOf(spark, parts.head).exists(_.viewExists(identOf(parts))) =>
      GraftRenameViewCommand(parts, newName)

    case u: UnresolvedRelation
        if u.multipartIdentifier.length >= 2 &&
          isGraft(spark, u.multipartIdentifier) &&
          catalogOf(spark, u.multipartIdentifier.head)
            .exists(_.viewExists(identOf(u.multipartIdentifier))) =>
      val cat = catalogOf(spark, u.multipartIdentifier.head).get
      val v = cat.loadView(identOf(u.multipartIdentifier))
      // Restore the DEFINITION context (Spark's View node / Iceberg
      // view-spec contract): unqualified table names in the stored SQL
      // must resolve against the catalog/namespace current at CREATE
      // VIEW time, not whatever the reader's session happens to have —
      // otherwise the same view can silently read a different
      // same-named table. The persisted currentCatalog/currentNamespace
      // qualify every under-qualified relation before substitution.
      SubqueryAlias(u.multipartIdentifier.last,
        qualifyRelations(spark,
          spark.sessionState.sqlParser.parsePlan(v.query()),
          v.currentCatalog(), v.currentNamespace()))
  }
}

object GraftViews {
  def catalogOf(spark: SparkSession, name: String): Option[GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch {
      // NonFatal only: a missing catalog is "not ours", but an OOM or
      // linkage error during plugin load must propagate, not masquerade
      // as a resolution miss downstream
      case scala.util.control.NonFatal(_) => None
    }

  /** True iff `name` resolves to ANY registered catalog — used to
    * decide whether a 2-part identifier's head is a catalog or a
    * namespace in the definition catalog. */
  private def isAnyCatalog(spark: SparkSession, name: String): Boolean =
    try { spark.sessionState.catalogManager.catalog(name); true }
    catch { case scala.util.control.NonFatal(_) => false }

  /** Qualify under-qualified table references in a re-parsed view body
    * with the view's persisted definition context: a 1-part name gets
    * the stored catalog + namespace; a 2-part name `ns.t` prefers the
    * DEFINITION-context reading — when `ns` is a namespace that exists
    * in the view's own catalog, the reference is qualified with that
    * catalog, EVEN IF a session catalog named `ns` is also registered
    * (ADVICE r9: otherwise registering a catalog whose name collides
    * with a definition-catalog namespace silently redirects every
    * existing view body — the same-named-table hazard this pass
    * exists to prevent). Only when the head is NOT a definition-
    * catalog namespace does the catalog-head interpretation apply.
    * Descends into subquery expressions so scalar/IN subqueries inside
    * the view body resolve in the same context. */
  def qualifyRelations(spark: SparkSession, plan: LogicalPlan,
      cat: String, ns: Array[String]): LogicalPlan = {
    lazy val defCat = catalogOf(spark, cat)
    plan.transformDownWithSubqueries {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        r.copy(multipartIdentifier =
          (cat +: ns :+ r.multipartIdentifier.head).toSeq)
      case r: UnresolvedRelation if r.multipartIdentifier.length == 2 &&
          (defCat.exists(c =>
             try c.namespaceExists(Array(r.multipartIdentifier.head))
             catch { case scala.util.control.NonFatal(_) => false }) ||
           !isAnyCatalog(spark, r.multipartIdentifier.head)) =>
        r.copy(multipartIdentifier = cat +: r.multipartIdentifier)
    }
  }

  /** `parts` = catalog.namespace....name — ours iff the head names a
    * registered GraftCatalog and there is at least ns + name. */
  def isGraft(spark: SparkSession, parts: Seq[String]): Boolean =
    parts.length >= 3 && catalogOf(spark, parts.head).isDefined

  def identOf(parts: Seq[String]): Identifier =
    Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)
}

case class GraftCreateViewCommand(parts: Seq[String], text: String,
    comment: Option[String], props: Map[String, String],
    allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViews.catalogOf(spark, parts.head).get
    val ident = GraftViews.identOf(parts)
    if (cat.viewExists(ident) && !replace && allowExisting) return Nil
    // analysis only (the SELECT is lazy): the stored schema is the
    // view's contract at creation time. Analyze BEFORE any drop — a
    // failing replacement definition must leave the old view intact,
    // not destroy it and then error
    val schema: StructType = spark.sql(text).schema
    if (cat.viewExists(ident) && replace) cat.dropView(ident)
    val cm = spark.sessionState.catalogManager
    cat.createView(new ViewInfo(ident, text,
      cm.currentCatalog.name, cm.currentNamespace,
      schema, schema.fieldNames, Array.empty, Array.empty,
      {
        val m = new java.util.HashMap[String, String]()
        props.foreach { case (k, v) => m.put(k, v) }
        comment.foreach(m.put(ViewCatalog.PROP_COMMENT, _))
        m
      }))
    Nil
  }
}

case class GraftDropViewCommand(parts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViews.catalogOf(spark, parts.head).get
    val dropped = cat.dropView(GraftViews.identOf(parts))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(GraftViews.identOf(parts))
    Nil
  }
}

case class GraftShowViewsCommand(ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViews.catalogOf(spark, ns.head).get
    cat.listViews(ns.drop(1): _*).toSeq
      .filter(i => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(i.name), p).nonEmpty))
      .map(i => Row(i.namespace.mkString("."), i.name, false))
  }
}

case class GraftSetViewPropertiesCommand(parts: Seq[String],
    props: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViews.catalogOf(spark, parts.head).get
    import org.apache.spark.sql.connector.catalog.ViewChange
    cat.alterView(GraftViews.identOf(parts),
      props.toSeq.map { case (k, v) =>
        ViewChange.setProperty(k, v) }: _*)
    Nil
  }
}

case class GraftUnsetViewPropertiesCommand(parts: Seq[String],
    keys: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViews.catalogOf(spark, parts.head).get
    import org.apache.spark.sql.connector.catalog.ViewChange
    val ident = GraftViews.identOf(parts)
    if (!ifExists) {
      val have = cat.loadView(ident).properties()
      keys.foreach(k => if (!have.containsKey(k))
        throw new IllegalArgumentException(
          s"view ${parts.mkString(".")} has no property '$k' " +
            "(use IF EXISTS to ignore)"))
    }
    cat.alterView(ident,
      keys.map(ViewChange.removeProperty): _*)
    Nil
  }
}

case class GraftRenameViewCommand(parts: Seq[String],
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViews.catalogOf(spark, parts.head).get
    // the rename target resolves WITHIN the view's catalog; a bare
    // name keeps the SOURCE namespace (an empty-namespace target
    // would relocate the view to the warehouse root, where the
    // >=3-part resolution rule can never find it again)
    val from = GraftViews.identOf(parts)
    val toNs =
      if (newName.length > 1) newName.dropRight(1).toArray
      else from.namespace
    cat.renameView(from, Identifier.of(toNs, newName.last))
    Nil
  }
}
