package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation,
  CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-table source, written against the public
  * DataSource V2 connector API to prove the engine's source-extension
  * surface end-to-end (TableProvider -> ScanBuilder -> Batch ->
  * PartitionReader) — the reference's only "source" is a whole-file text
  * scan; a pluggable columnar source is the Spark-native generalization.
  *
  * The row at index i is a pure function of i (a Knuth multiplicative
  * hash), so the table is reproducible on any cluster and mirrorable in
  * ANSI SQL — the q43 oracle recomputes it in DuckDB from `range()`.
  *
  * Scale design: no driver-side data — `planInputPartitions` ships only
  * (start, end) offsets; each executor generates its slice. Filter
  * pushdown narrows the generated id range BEFORE planning (a 100 TB
  * virtual table filtered to one id-window generates exactly that
  * window), and column pruning drops per-row work for unread columns.
  *
  * Usage: `spark.read.format("graft.sources.GenSource")
  *   .option("rows", n).option("slices", p).load()`.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Knuth multiplicative hash of the row index, kept in [0, 2^32) so
    * every derived column is exact in both Long and DuckDB BIGINT
    * arithmetic (no overflow below ~3.5e9 rows; enforced in GenTable).
    */
  def h(id: Long): Long = (id * 2654435761L) % 4294967296L
  def bucket(id: Long): Int = (h(id) % 100L).toInt
  /** Exact in IEEE double: h < 2^32 is integer-exact, /2^32 is a power-
    * of-two scale — DuckDB's `h / 4294967296.0` yields the same bits.
    */
  def value(id: Long): Double = h(id).toDouble / 4294967296.0
  def tag(id: Long): String = "t" + (h(id) % 7L)
}

class GenTable(rows: Long, slices: Int) extends Table with SupportsRead {
  require(rows >= 0 && rows <= 3400000000L,
    s"rows=$rows would overflow the 64-bit hash product")
  require(slices >= 1, "slices must be >= 1")
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices)
}

/** Pushdown state: [lo, hi) is the id range that survives every accepted
  * filter; pruned columns narrow the emitted schema.
  */
class GenScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var prunedSchema: StructType = GenSource.schema
  private var pushedAgg: Option[Aggregation] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (push, remain) = filters.partition {
      case EqualTo("id", _: Number) => true
      case GreaterThan("id", _: Number) => true
      case GreaterThanOrEqual("id", _: Number) => true
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case _ => false
    }
    push.foreach {
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue + 1)
      case _ =>
    }
    accepted = push
    remain
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  /** COMPLETE aggregate pushdown for ungrouped COUNT(*)/MIN(id)/MAX(id):
    * every supported aggregate is a closed form over the pushed [lo, hi)
    * id range (the generated ids are exactly lo..hi-1), so the source
    * answers from arithmetic WITHOUT generating a single row — on the
    * 3.4-billion-row virtual table a count is O(1), not O(n).
    *
    * PARTIAL grouped pushdown (round 9) for GROUP BY bucket|tag over the
    * same three functions: the source cannot answer groups in closed
    * form (the group key is a hash of the id), but it CAN fold its
    * slice into per-group partials — `supportCompletePushDown` returns
    * false, so Spark plans its own FINAL aggregate over the scan's
    * (group, partials) rows (count merged by sum, min by min, max by
    * max — the V2ScanRelationPushDown partial contract, the same shape
    * parquet footer-stats pushdown uses). What crosses the
    * source→engine boundary shrinks from n rows to
    * groups × partitions rows. Anything else (other group keys, other
    * functions) is declined and Spark falls back to the plain
    * generate-and-aggregate plan — a declined pushdown must never
    * change results, only cost.
    */
  private def aggSupported(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && supportedFns(agg)
  private def supportedFns(agg: Aggregation): Boolean =
    agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isIdRef(m.column)
        case m: Max => isIdRef(m.column)
        case _ => false
      }
  private def groupAggSupported(agg: Aggregation): Boolean =
    agg.groupByExpressions.length == 1 && supportedFns(agg) &&
      (agg.groupByExpressions.head match {
        case nr: NamedReference =>
          nr.fieldNames.sameElements(Array("bucket")) ||
            nr.fieldNames.sameElements(Array("tag"))
        case _ => false
      })
  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggSupported(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (aggSupported(agg) || groupAggSupported(agg)) {
      pushedAgg = Some(agg); true
    } else false
  }

  override def build(): Scan = {
    val l = math.min(lo, hi)
    val h = math.max(l, hi)
    pushedAgg match {
      case Some(agg) if agg.groupByExpressions.isEmpty =>
        new GenAggScan(l, h, agg)
      case Some(agg) => new GenGroupAggScan(l, h, slices, agg)
      case None => new GenScan(l, h, slices, prunedSchema)
    }
  }
}

/** One-row, one-partition scan carrying the closed-form aggregate
  * answers for the pushed id range (complete pushdown: Spark plans no
  * aggregate on top). Empty range: COUNT = 0, MIN/MAX = null — the
  * same semantics the generate-and-aggregate plan produces.
  */
class GenAggScan(lo: Long, hi: Long, agg: Aggregation) extends Scan with Batch {
  private val n = math.max(0L, hi - lo)
  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GenAggScan PushedRange: [$lo, $hi) PushedAggregates: " +
      agg.aggregateExpressions.map(_.describe).mkString("[", ", ", "]")
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => n: Any
      case _: Min => if (n == 0L) null else lo: Any
      case _: Max => if (n == 0L) null else (hi - 1): Any
      case other => throw new IllegalStateException(
        s"unsupported pushed aggregate ${other.describe} — " +
          "aggSupported must reject these")
    }
    new SingleRowReaderFactory(values)
  }
}

/** PARTIAL grouped pushdown scan: same slice partitioning as the plain
  * scan, but each reader folds its slice into per-group partial
  * aggregates and emits groups × 1 rows instead of its slice — Spark's
  * final aggregate (planned because `supportCompletePushDown` said
  * false) merges the partials. Groups are emitted in key order, so the
  * scan output is deterministic per partition.
  */
class GenGroupAggScan(lo: Long, hi: Long, slices: Int, agg: Aggregation)
    extends Scan with Batch {
  private val groupCol = agg.groupByExpressions.head
    .asInstanceOf[NamedReference].fieldNames.head
  override def readSchema(): StructType = StructType(
    StructField(groupCol,
      if (groupCol == "bucket") IntegerType else StringType,
      nullable = false) +:
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) =>
        StructField(s"agg$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GenGroupAggScan PushedRange: [$lo, $hi) PushedGroupBy: [$groupCol] " +
      "PushedAggregates: " +
      agg.aggregateExpressions.map(_.describe).mkString("[", ", ", "]")
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val per = math.max(1L, (n + slices - 1) / slices)
      (lo until hi by per).map(s =>
        GenPartition(s, math.min(s + per, hi)): InputPartition).toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GroupAggReaderFactory(groupCol, agg.aggregateExpressions.map {
      case _: CountStar => 'c'
      case _: Min => 'n'
      case _: Max => 'x'
      case other => throw new IllegalStateException(
        s"unsupported pushed aggregate ${other.describe}")
    })
}

class GroupAggReaderFactory(groupCol: String, fns: Array[Char])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    // fold the slice: group key -> (count, min id, max id)
    val acc = scala.collection.mutable.TreeMap.empty[Any, (Long, Long, Long)](
      Ordering.by(_.toString))
    var id = gp.start
    while (id < gp.end) {
      val key: Any =
        if (groupCol == "bucket") GenSource.bucket(id) else GenSource.tag(id)
      val (c, mn, mx) = acc.getOrElse(key, (0L, Long.MaxValue, Long.MinValue))
      acc(key) = (c + 1, math.min(mn, id), math.max(mx, id))
      id += 1
    }
    val rows = acc.iterator.map { case (k, (c, mn, mx)) =>
      val kv: Any = if (groupCol == "bucket") k
        else UTF8String.fromString(k.asInstanceOf[String])
      InternalRow.fromSeq(kv +: fns.toSeq.map {
        case 'c' => c: Any
        case 'n' => mn: Any
        case 'x' => mx: Any
      })
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (rows.hasNext) { cur = rows.next(); true } else false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

class SingleRowReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

class GenScan(lo: Long, hi: Long, slices: Int, pruned: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def description(): String =
    s"GenScan PushedRange: [$lo, $hi) ReadSchema: ${pruned.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val per = math.max(1L, (n + slices - 1) / slices)
      (lo until hi by per).map(s =>
        GenPartition(s, math.min(s + per, hi)): InputPartition).toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(pruned)
}

case class GenPartition(start: Long, end: Long) extends InputPartition

class GenReaderFactory(pruned: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    // resolve column generators once per partition, not per row
    val gens: Array[Long => Any] = pruned.fieldNames.map {
      case "id" => (id: Long) => id
      case "bucket" => (id: Long) => GenSource.bucket(id)
      case "val" => (id: Long) => GenSource.value(id)
      case "tag" => (id: Long) => UTF8String.fromString(GenSource.tag(id))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = gp.start - 1
      override def next(): Boolean = { cur += 1; cur < gp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
