package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** CATALOG-PERSISTED VIEWS on the graft warehouse: a view is a tiny
  * `<warehouse>/<ns...>/<name>.gview` file holding the SQL text — the
  * first thing an analyst does on a curated table is name a query, and
  * a session-local temp view dies with the session.
  *
  * Spark 4.1 ships the `ViewCatalog` connector interface but wires NO
  * SQL statement or resolution to it (nothing in the analyzer calls
  * `loadView` — verified against the jars), so the surface has two
  * halves, both on public API:
  *
  *   - DDL via procedures: `CALL g.system.create_view(name, sql)` /
  *     `drop_view` (and [[GraftCatalog]] implements `ViewCatalog`
  *     proper, so the day Spark wires `CREATE VIEW` to v2 catalogs the
  *     statement lands on the same storage);
  *   - resolution via a SparkSessionExtensions analyzer rule
  *     ([[GraftViewResolution]], registered by
  *     [[graft.GraftExtensions]]): an unresolved `g.ns.v` whose catalog
  *     is a GraftCatalog and whose name matches a stored view expands
  *     to its parsed SQL (nested views expand recursively, cycle-
  *     guarded), after which `SELECT * FROM g.db.v` just works.
  *
  * View SQL is stored verbatim and re-parsed at every read — a view
  * over a time-travel read (`VERSION AS OF`) pins its snapshot, a view
  * over a live table tracks it, exactly as the text says. Table names
  * inside the SQL should be fully qualified (the text re-resolves in
  * the reading session's context).
  *
  * BASE-TABLE EVOLUTION CONTRACT (CatalogSpec pins both sides): the
  * re-parse means a `SELECT *` view TRACKS its base table's schema —
  * a column added to the table appears in the view on the next read;
  * a view that NAMES a column the table has since dropped fails
  * analysis with the analyzer's unresolved-column error (a typed
  * failure at read/DESCRIBE time, never a silent null). Views are
  * text, not snapshots of a schema.
  */
private[sources] object GraftViews {

  private def path(wh: String, parts: Seq[String]): String =
    (wh +: parts).mkString("/") + ".gview"

  /** VIEW-MISS cache: [[GraftViewResolution]] probes every `g.*`
    * identifier in every analysis, and almost all of them are TABLES —
    * without this each analysis of a hot SQL path pays one filesystem
    * `exists()` per relation. Only MISSES cache (hits re-read the
    * text, preserving re-parse-at-every-read semantics); create/drop
    * invalidate, so a view created in this session is visible to the
    * statement after (CatalogSpec pins it). Per-JVM: a view created by
    * a DIFFERENT driver under a name this one already probed stays
    * invisible here until this JVM's own create/drop of that name —
    * the single-driver-per-warehouse deployment this engine assumes.
    */
  private val missCache =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def exists(wh: String, parts: Seq[String]): Boolean =
    FsMeta.exists(path(wh, parts))

  def read(wh: String, parts: Seq[String]): Option[String] = {
    val p = path(wh, parts)
    if (missCache.contains(p)) None
    else if (!FsMeta.exists(p)) { missCache.add(p); None }
    else FsMeta.readString(p).linesIterator
      .collectFirst { case l if l.startsWith("sql=") =>
        ManifestTable.unescape(l.stripPrefix("sql=")) }
  }

  def write(wh: String, parts: Seq[String], sql: String): Unit = {
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      "view name must be non-empty")
    if (parts.length > 1) FsMeta.mkdirs((wh +: parts.init).mkString("/"))
    FsMeta.writeString(path(wh, parts),
      s"sql=${ManifestTable.escape(sql)}\n")
    missCache.remove(path(wh, parts)): Unit
  }

  def drop(wh: String, parts: Seq[String]): Boolean =
    if (!exists(wh, parts)) false
    else {
      FsMeta.deleteRecursive(path(wh, parts))
      missCache.remove(path(wh, parts))
      true
    }

  def list(wh: String, ns: Seq[String]): Seq[String] =
    FsMeta.listFiles((wh +: ns).mkString("/"))
      .filter(_.endsWith(".gview")).map(_.stripSuffix(".gview")).sorted
}

/** The view-expansion analyzer rule (see [[GraftViews]]): resolves an
  * [[UnresolvedRelation]] whose leading part names a configured
  * GraftCatalog and whose remainder matches a stored `.gview` file,
  * substituting the parsed view SQL (recursively — a view may read
  * other views — with an explicit depth guard so a cycle is a typed
  * error, not an analyzer livelock).
  */
case class GraftViewResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val MaxDepth = 8

  private def viewSql(parts: Seq[String]): Option[String] = {
    if (parts.length < 2) return None
    val impl = spark.conf.getOption(s"spark.sql.catalog.${parts.head}")
    if (!impl.contains(classOf[GraftCatalog].getName)) return None
    spark.conf.getOption(s"spark.sql.catalog.${parts.head}.warehouse")
      .flatMap(wh => GraftViews.read(wh, parts.tail))
  }

  private def expand(parts: Seq[String], sql: String,
      depth: Int): LogicalPlan = {
    if (depth > MaxDepth) throw new IllegalStateException(
      s"view nesting deeper than $MaxDepth at ${parts.mkString(".")} — " +
        "cycle between views?")
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val substituted = parsed.transformUp {
      case u: UnresolvedRelation =>
        viewSql(u.multipartIdentifier) match {
          case Some(inner) =>
            SubqueryAlias(u.multipartIdentifier.last,
              expand(u.multipartIdentifier, inner, depth + 1))
          case None => u
        }
    }
    substituted
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        viewSql(u.multipartIdentifier) match {
          case Some(sql) =>
            SubqueryAlias(u.multipartIdentifier.last,
              expand(u.multipartIdentifier, sql, 1))
          case None => u
        }
    }
}
