package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** KEY-GROUPED twin of [[GenSource]]: the same deterministic virtual
  * table, but physically organized as one input partition per `bucket`
  * value, with the layout REPORTED to Spark
  * ([[SupportsReportPartitioning]] → [[KeyGroupedPartitioning]] on the
  * identity transform of `bucket`, each partition carrying its key via
  * [[HasPartitionKey]]). That report is what unlocks the
  * STORAGE-PARTITIONED JOIN: two such tables joined on `bucket` plan
  * with ZERO shuffle exchanges — Spark aligns the co-partitioned scans
  * directly (the Iceberg bucket-join mechanism, `spark.sql.sources
  * .v2.bucketing.enabled`), which at 100 TB is the difference between
  * a full two-sided shuffle and none at all. The same report removes
  * the exchange under a `bucket`-grouped aggregation.
  *
  * `bucket` here is h(id) mod the `buckets` option (default 32) so the
  * partition count is a layout parameter; two tables co-partition iff
  * they agree on it — exactly the bucketed-table contract. Virtual-
  * source honesty: each partition reader regenerates the id range and
  * filters to its bucket (O(rows) per partition — fine for a proof
  * table; a real source reads bucket-clustered files and pays only its
  * slice).
  */
class GenKeyedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenKeyedTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("buckets", "32").toInt)
}

class GenKeyedTable(rows: Long, buckets: Int) extends Table
    with SupportsRead {
  require(rows >= 0 && rows <= 3400000000L, "rows overflow the hash product")
  require(buckets >= 1, "buckets must be >= 1")
  override def name(): String = s"graftgenkeyed($rows, $buckets)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenKeyedScanBuilder(rows, buckets)
}

class GenKeyedScanBuilder(rows: Long, buckets: Int) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var pruned: StructType = GenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema
  override def build(): Scan = new GenKeyedScan(rows, buckets, pruned)
}

class GenKeyedScan(rows: Long, buckets: Int, pruned: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def description(): String =
    s"GenKeyedScan rows=$rows KeyGroupedBy: [bucket % $buckets] " +
      s"ReadSchema: ${pruned.simpleString}"
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), buckets)
  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets).map(b =>
      GenKeyedPartition(b, rows, buckets): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GenKeyedReaderFactory(pruned, buckets)
}

case class GenKeyedPartition(bucket: Int, rows: Long, buckets: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class GenKeyedReaderFactory(pruned: StructType, buckets: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[GenKeyedPartition]
    val gens: Array[Long => Any] = pruned.fieldNames.map {
      case "id" => (id: Long) => id
      case "bucket" => (id: Long) => (GenSource.h(id) % buckets).toInt
      case "val" => (id: Long) => GenSource.value(id)
      case "tag" => (id: Long) => UTF8String.fromString(GenSource.tag(id))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = -1L
      override def next(): Boolean = {
        cur += 1
        while (cur < kp.rows && (GenSource.h(cur) % buckets).toInt != kp.bucket)
          cur += 1
        cur < kp.rows
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
