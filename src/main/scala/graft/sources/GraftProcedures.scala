package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable table maintenance — Spark 4's procedure API wired to the
  * manifest table's maintenance surface, so the operations a table
  * operator runs daily need no Scala at all:
  *
  * {{{
  *   CALL g.system.compact(table => 'db.t', target_files => 4)
  *   CALL g.system.vacuum(table => 'db.t', grace_ms => 0)
  *   CALL g.system.expire_snapshots(table => 'db.t', keep_last => 3)
  *   CALL g.system.rollback(table => 'db.t', version => 2)
  *   CALL g.system.create_branch(table => 'db.t', name => 'audit')
  *   CALL g.system.fast_forward(table => 'db.t', name => 'audit')
  *   CALL g.system.drop_branch(table => 'db.t', name => 'audit')
  *   CALL g.system.history(table => 'db.t')
  * }}}
  *
  * Each returns its result as rows (a [[LocalScan]]), so `CALL` output
  * composes with the rest of SQL. The `table` argument is
  * catalog-relative (`ns.table` under the warehouse), resolved by the
  * owning [[GraftCatalog]].
  */
private[sources] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def list(ns: Array[String]): Array[Identifier] =
    if (!ns.sameElements(Namespace)) Array.empty
    else names.map(n => Identifier.of(Namespace, n)).toArray

  private val names = Seq("compact", "vacuum", "expire_snapshots",
    "rollback", "create_branch", "fast_forward", "drop_branch", "history",
    "set_partition_spec", "analyze_ndv", "create_view", "drop_view",
    "show_views", "describe_view")

  def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"unknown procedure namespace ${ident.namespace().mkString(".")}")
    def dirOf(rel: String): String =
      (warehouse +: rel.split("\\.").toSeq).mkString("/")
    def p(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
    ident.name() match {
      case "compact" => proc("compact",
        Seq(p("table", StringType), p("target_files", IntegerType)),
        StructType(Seq(StructField("files_before", IntegerType),
          StructField("files_after", IntegerType)))) { in =>
        val (b, a) = ManifestTable.compact(
          org.apache.spark.sql.SparkSession.active,
          dirOf(requireArg(in.getUTF8String(0), "table")), in.getInt(1))
        Seq(InternalRow(b, a))
      }
      case "vacuum" => proc("vacuum",
        Seq(p("table", StringType), p("grace_ms", LongType)),
        StructType(Seq(StructField("reclaimed", IntegerType)))) { in =>
        Seq(InternalRow(ManifestTable.vacuum(
          dirOf(requireArg(in.getUTF8String(0), "table")),
          in.getLong(1)).size))
      }
      case "expire_snapshots" => proc("expire_snapshots",
        Seq(p("table", StringType), p("keep_last", IntegerType)),
        StructType(Seq(StructField("expired", IntegerType)))) { in =>
        Seq(InternalRow(ManifestTable.expireSnapshots(
          dirOf(requireArg(in.getUTF8String(0), "table")),
          in.getInt(1)).size))
      }
      case "rollback" => proc("rollback",
        Seq(p("table", StringType), p("version", LongType)),
        StructType(Seq(StructField("version", LongType)))) { in =>
        Seq(InternalRow(ManifestTable.rollback(
          dirOf(requireArg(in.getUTF8String(0), "table")),
          in.getLong(1))))
      }
      case "create_branch" => proc("create_branch",
        Seq(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("forked_at", LongType)))) { in =>
        Seq(InternalRow(ManifestTable.createBranch(
          dirOf(requireArg(in.getUTF8String(0), "table")),
          requireArg(in.getUTF8String(1), "name"))))
      }
      case "fast_forward" => proc("fast_forward",
        Seq(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("version", LongType)))) { in =>
        Seq(InternalRow(ManifestTable.fastForward(
          dirOf(requireArg(in.getUTF8String(0), "table")),
          requireArg(in.getUTF8String(1), "name"))))
      }
      case "drop_branch" => proc("drop_branch",
        Seq(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType)))) { in =>
        ManifestTable.dropBranch(
          dirOf(requireArg(in.getUTF8String(0), "table")),
          requireArg(in.getUTF8String(1), "name"))
        Seq(InternalRow(true))
      }
      // PARTITION-SPEC EVOLUTION: change the DECLARED (write-side)
      // partitioning without rewriting anything — existing files keep
      // their recorded layout, subsequent INSERTs take the new spec
      // (Iceberg's spec-evolution shape). A mixed table's whole-scan
      // layout report degrades to unknown; a scan pruned to one spec's
      // files regains key-grouping for what it reads. `columns` is
      // comma-separated; '' clears the spec (plain appends thereafter).
      case "set_partition_spec" => proc("set_partition_spec",
        Seq(p("table", StringType), p("columns", StringType)),
        StructType(Seq(StructField("columns", StringType)))) { in =>
        val dir = dirOf(requireArg(in.getUTF8String(0), "table"))
        val m = ManifestTable.readManifest(dir).getOrElse(
          throw new IllegalArgumentException(
            s"no committed manifest at $dir"))
        val cols = requireArg(in.getUTF8String(1), "columns")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        cols.foreach { c =>
          val f = m.schema.fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"set_partition_spec names absent column '$c'"))
          f.dataType match {
            case BooleanType | IntegerType | LongType | StringType =>
            case other => throw new IllegalArgumentException(
              s"partition column '$c' is ${other.sql} — supported: " +
                "boolean, int, bigint, string")
          }
        }
        TblMeta.write(dir, cols)
        Seq(InternalRow(UTF8String.fromString(cols.mkString(","))))
      }
      // ANALYZE-style NDV retrofit: one distributed read pass attaches
      // per-file KMV sketches to an existing table's manifest entries
      // (metadata-only commit — zero data files rewritten); the scan's
      // columnStats report feeds CBO from the next query on.
      case "analyze_ndv" => proc("analyze_ndv",
        Seq(p("table", StringType), p("columns", StringType)),
        StructType(Seq(StructField("files_analyzed", IntegerType)))) { in =>
        val n = AnalyzeNdv.run(org.apache.spark.sql.SparkSession.active,
          dirOf(requireArg(in.getUTF8String(0), "table")),
          requireArg(in.getUTF8String(1), "columns")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        Seq(InternalRow(n))
      }
      // CATALOG-PERSISTED VIEWS (see [[GraftViews]]): Spark 4.1 wires
      // no SQL statement to the v2 ViewCatalog, so DDL arrives here;
      // reads resolve through the GraftViewResolution extension rule.
      case "create_view" => proc("create_view",
        Seq(p("name", StringType), p("sql", StringType)),
        StructType(Seq(StructField("created", BooleanType)))) { in =>
        val parts = requireArg(in.getUTF8String(0), "name")
          .split("\\.").toSeq
        val sql = requireArg(in.getUTF8String(1), "sql")
        require(!parts.exists(_.contains(".stage-")),
          "'.stage-' is reserved for CTAS staging directories")
        require(!FsMeta.exists(ManifestTable.manifestPath(
            (warehouse +: parts).mkString("/"))),
          s"a table named ${parts.mkString(".")} already exists")
        require(!GraftViews.exists(warehouse, parts),
          s"view ${parts.mkString(".")} already exists")
        // the text must at least parse NOW — resolution happens at read
        org.apache.spark.sql.SparkSession.active
          .sessionState.sqlParser.parsePlan(sql)
        GraftViews.write(warehouse, parts, sql)
        Seq(InternalRow(true))
      }
      // SHOW VIEWS for the procedure-DDL era (Spark 4.1 routes the
      // `SHOW VIEWS` statement to the session catalog only): one row
      // per stored view directly under `namespace`, name-sorted.
      case "show_views" => proc("show_views",
        Seq(p("namespace", StringType)),
        StructType(Seq(StructField("namespace", StringType),
          StructField("name", StringType)))) { in =>
        val ns = requireArg(in.getUTF8String(0), "namespace")
          .split("\\.").toSeq.filter(_.nonEmpty)
        GraftViews.list(warehouse, ns).map(v => InternalRow(
          UTF8String.fromString(ns.mkString(".")),
          UTF8String.fromString(v)))
      }
      // DESCRIBE VIEW: the stored text plus the schema the text
      // resolves to RIGHT NOW in this session — a view over an evolved
      // base table describes with the evolved schema; a view naming a
      // since-dropped column fails here with the same analyzer error
      // a read would raise (the evolution contract, pinned in
      // CatalogSpec — stale text is a typed error, never silent).
      case "describe_view" => proc("describe_view",
        Seq(p("name", StringType)),
        StructType(Seq(StructField("name", StringType),
          StructField("sql", StringType),
          StructField("schema", StringType)))) { in =>
        val parts = requireArg(in.getUTF8String(0), "name")
          .split("\\.").toSeq
        val sql = GraftViews.read(warehouse, parts).getOrElse(
          throw new IllegalArgumentException(
            s"no view ${parts.mkString(".")}"))
        val spark = org.apache.spark.sql.SparkSession.active
        val schema = spark.sessionState
          .executePlan(spark.sessionState.sqlParser.parsePlan(sql))
          .analyzed.schema.toDDL
        Seq(InternalRow(UTF8String.fromString(parts.mkString(".")),
          UTF8String.fromString(sql), UTF8String.fromString(schema)))
      }
      case "drop_view" => proc("drop_view",
        Seq(p("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType)))) { in =>
        val parts = requireArg(in.getUTF8String(0), "name")
          .split("\\.").toSeq
        if (!GraftViews.drop(warehouse, parts))
          throw new IllegalArgumentException(
            s"no view ${parts.mkString(".")} — nothing dropped")
        Seq(InternalRow(true))
      }
      case "history" => proc("history",
        Seq(p("table", StringType)),
        StructType(Seq(StructField("version", LongType),
          StructField("n_files", IntegerType),
          StructField("n_rows", LongType),
          StructField("epoch", LongType),
          StructField("ts_ms", LongType),
          StructField("operation", StringType)))) { in =>
        ManifestTable.history(
            dirOf(requireArg(in.getUTF8String(0), "table")))
          .map { case (v, nf, nr, ep, ts, op) => InternalRow(v, nf, nr,
            ep, ts, org.apache.spark.unsafe.types.UTF8String.fromString(op)) }
      }
      case other => throw new IllegalArgumentException(
        s"unknown procedure: $other (have ${names.mkString(", ")})")
    }
  }

  private def proc(procName: String, params: Seq[ProcedureParameter],
      out: StructType)(body: InternalRow => Seq[InternalRow])
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft $procName"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft $procName"
        override def parameters(): Array[ProcedureParameter] =
          params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          // NULL sweep over EVERY parameter before any getter runs: a
          // null string would NPE, but a null NUMERIC silently unboxes
          // to 0 — `vacuum(..., grace_ms => NULL)` would run with a
          // zero grace window and could reclaim another writer's
          // just-staged uncommitted files. Same typed error for both.
          params.indices.foreach { i =>
            require(!input.isNullAt(i),
              s"procedure argument '${params(i).name}' is required " +
                "(got NULL)")
          }
          val result = body(input).toArray
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = result
            override def readSchema(): StructType = out
          }).iterator()
        }
      }
  }

  /** Belt-and-braces beneath the generic NULL sweep in [[proc]] (which
    * guards every parameter, numeric included, before any getter runs).
    */
  private def requireArg(s: UTF8String, what: String): String = {
    require(s != null, s"procedure argument '$what' is required")
    s.toString
  }
}
