package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over manifest tables — the DDL/DML surface that makes the
  * connector a first-class `spark.sql` citizen:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.g.warehouse", "/data/wh")
  *   spark.sql("CREATE TABLE g.db.t (id BIGINT, s STRING) PARTITIONED BY (s)")
  *   spark.sql("INSERT INTO g.db.t SELECT ...")
  *   spark.sql("DELETE FROM g.db.t WHERE s = 'x'")     // metadata-only
  *   spark.sql("SELECT * FROM g.db.t VERSION AS OF 3") // time travel
  *   spark.sql("SELECT * FROM g.db.t VERSION AS OF 'audit'") // branch read
  *   spark.sql("ALTER TABLE g.db.t ADD COLUMN v DOUBLE") // schema evolution
  * }}}
  *
  * Layout: one directory per table under `warehouse/<ns...>/<name>`; the
  * table IS its manifest (no metastore — Iceberg's HadoopCatalog shape).
  * A `PARTITIONED BY (col)` identity transform persists in a tiny
  * `_TBLMETA` file and every INSERT through the catalog auto-applies the
  * `partitionColumn` write path (clustered distribution, single-valued
  * files, storage-partitioned-join report). `VERSION AS OF` accepts a
  * version number or a BRANCH name — the write-audit-publish audit read,
  * in SQL. DELETE WHERE goes through [[GTabDelete]]: whole files whose
  * partition value / zone maps PROVE all-match are dropped by metadata,
  * provably-unaffected files are never opened, only the boundary files
  * rewrite.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  // SQL-callable maintenance (CALL g.system.compact(...) etc.)
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(warehouse, ident)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")
  private def dirOf(ns: Seq[String]): String =
    (warehouse +: ns).mkString("/")
  private def isTable(dir: String): Boolean =
    FsMeta.exists(ManifestTable.manifestPath(dir))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirOf(namespace.toSeq)
    if (!FsMeta.isDirectory(d)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    FsMeta.listSubdirs(d).filter(n => isTable(s"$d/$n"))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    val m = ManifestTable.readManifest(dir).getOrElse(
      throw new NoSuchTableException(ident))
    new GTable(dir, m.schema, declaredPart = TblMeta.partitionCols(dir))
  }

  /** SQL time travel: `VERSION AS OF <n>` pins a snapshot; a non-numeric
    * version is read as a BRANCH name — the WAP audit read in SQL.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    version.toLongOption match {
      case Some(v) =>
        new GTable(dir, ManifestTable.readManifestAsOf(dir, v).schema,
          travelVersion = Some(v))
      case None =>
        val bh = ManifestTable.readManifest(dir, version).getOrElse(
          throw new NoSuchTableException(ident))
        new GTable(dir, bh.schema, travelBranch = Some(version))
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    ManifestTable.checkSupported(schema)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        val c = t.references()(0).fieldNames.mkString(".")
        require(schema.fieldNames.contains(c),
          s"PARTITIONED BY names absent column '$c'")
        c
      case other => throw new UnsupportedOperationException(
        s"graft tables support PARTITIONED BY identity columns, " +
          s"got $other")
    }
    FsMeta.mkdirs(dir)
    ManifestTable.commitVersion(dir, schema, Nil, keepPrevious = false)
    if (partCols.nonEmpty) TblMeta.write(dir, partCols)
    new GTable(dir, schema, declaredPart = partCols)
  }

  /** Schema evolution in SQL: ADD COLUMN commits the evolved schema as
    * the next manifest version (existing files read null for it — the
    * reader's by-name resolution). Other changes are rejected loudly.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident)
    val m = ManifestTable.readManifest(dir).getOrElse(
      throw new NoSuchTableException(ident))
    val newSchema = changes.foldLeft(m.schema) {
      case (s, add: TableChange.AddColumn) =>
        require(add.fieldNames().length == 1,
          "nested ADD COLUMN is not supported")
        val name = add.fieldNames()(0)
        require(!s.fieldNames.contains(name),
          s"column '$name' already exists")
        val next = s.add(name, add.dataType(), nullable = true)
        ManifestTable.checkSupported(next)
        next
      case (_, other) => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other (supported: ADD COLUMN)")
    }
    ManifestTable.commitVersion(dir, newSchema, Nil, keepPrevious = true)
    new GTable(dir, newSchema, declaredPart = TblMeta.partitionCols(dir))
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) false
    else { FsMeta.deleteRecursive(dir); true }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    FsMeta.mkdirs(dirOf(newIdent.namespace().toSeq))
    if (!FsMeta.renameIfAbsent(dirOf(oldIdent), dirOf(newIdent)))
      throw new TableAlreadyExistsException(newIdent)
  }

  // ---- namespaces (plain directories without a manifest) ----

  override def listNamespaces(): Array[Array[String]] =
    FsMeta.listSubdirs(warehouse)
      .filterNot(n => isTable(s"$warehouse/$n"))
      .map(n => Array(n)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val d = dirOf(namespace.toSeq)
    if (!FsMeta.isDirectory(d)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    FsMeta.listSubdirs(d).filterNot(n => isTable(s"$d/$n"))
      .map(n => namespace :+ n).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || FsMeta.isDirectory(dirOf(namespace.toSeq))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    FsMeta.mkdirs(dirOf(namespace.toSeq))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = dirOf(namespace.toSeq)
    if (!FsMeta.isDirectory(d)) false
    else {
      require(cascade || FsMeta.listSubdirs(d).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      FsMeta.deleteRecursive(d); true
    }
  }
}

/** Catalog-declared table metadata that must survive every commit: a
  * tiny `_TBLMETA` sidecar (`part=<col>`), written once at CREATE TABLE.
  * Kept OUTSIDE the manifest so no commit path needs to carry it and the
  * manifest format stays untouched; the SCAN still derives partitioning
  * from the files themselves (ground truth), this only drives the WRITE
  * side's auto-partitioning.
  */
private[sources] object TblMeta {
  private def path(dir: String) = s"$dir/_TBLMETA"
  def write(dir: String, partCols: Seq[String]): Unit =
    FsMeta.writeString(path(dir),
      s"part=${partCols.map(ManifestTable.escape).mkString(",")}\n")
  def partitionCols(dir: String): Seq[String] =
    if (!FsMeta.exists(path(dir))) Nil
    else FsMeta.readString(path(dir)).linesIterator
      .collectFirst { case l if l.startsWith("part=") =>
        l.stripPrefix("part=").split(",").filter(_.nonEmpty)
          .map(ManifestTable.unescape).toSeq }
      .getOrElse(Nil)
}
