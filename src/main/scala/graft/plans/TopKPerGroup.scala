package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.Bridge

/** Whole-operator planner extension: top-k rows per group as a first-class
  * logical node with its own physical strategy — the surface SURVEY §4.2
  * argues Spark's built-ins make optional, demonstrated here end-to-end
  * (LogicalPlan -> SparkStrategy -> SparkPlan, registered through
  * `experimental.extraStrategies` / GraftExtensions).
  *
  * How this relates to what Catalyst already derives: since 3.5, Spark's
  * InferWindowGroupLimit plans `row_number().over(...) <= k` with a
  * map-side WindowGroupLimit(Partial), so BOTH formulations cap the
  * shuffle at k rows per (group, input partition). The differences that
  * remain, and why the custom operator still earns its place at 100 TB:
  *  - the built-in partial requires a FULL local sort of every input
  *    partition beneath it (O(n log n), spill-prone on wide rows, and a
  *    second local sort above the exchange), and still computes the
  *    row_number column in a WindowExec before filtering it away; the
  *    partial here streams UNSORTED input through bounded per-group
  *    heaps in O(n log k) and the final pass never materializes a rank;
  *  - map-side memory is hard-capped: above `maxGroups` distinct groups
  *    per partition the partial degrades to passthrough (see below)
  *    instead of growing, a bound WindowGroupLimit gets from its sort
  *    (spill) and this operator gets without one.
  * PhysicalTopKSpec pins both plans' shuffle-volume metrics.
  */
case class TopKPerGroupNode(group: Seq[Attribute], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    maxGroups: Int = TopKPerGroup.defaultPartialMaxGroups) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  require(group.nonEmpty, "grouping columns must be non-empty")
  require(maxGroups >= 1, "maxGroups must be >= 1")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans TopKPerGroupNode as Final(exchange+sort inserted here)(Partial). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, child, maxGroups) =>
      TopKPerGroupFinalExec(group, order, k,
        TopKPerGroupPartialExec(group, order, k, planLater(child), maxGroups)) :: Nil
    case _ => Nil
  }
}

/** Map-side partial: per input partition, a bounded heap of the k best
  * rows per group (memory = k rows x groups-per-partition — the hash
  * aggregate shape). No distribution requirement, no sort: rows stream
  * through once, the heap keeps order internally.
  */
case class TopKPerGroupPartialExec(group: Seq[Attribute], order: Seq[SortOrder],
    k: Int, child: SparkPlan,
    maxGroups: Int = TopKPerGroup.defaultPartialMaxGroups) extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows (rows entering the shuffle)"),
    "numPassThroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through after the group cap (memory fallback)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (groupL, orderL, kL, capL, childOutput) =
      (group, order, k, maxGroups, child.output)
    val numOutputRows = longMetric("numOutputRows")
    val numPassThroughRows = longMetric("numPassThroughRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupL, childOutput)
      val ord = RowOrdering.create(orderL, childOutput)
      // heap head = worst kept row, so comparator is reversed
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // rows belonging to groups beyond the cap stream straight to the
      // shuffle unfiltered (no buffering — the exchange serializes each
      // emitted row before pulling the next, so the reused child row is
      // safe to forward) — the final exec still ranks them exactly, so
      // the cap trades shuffle volume for bounded map-side memory, the
      // same degrade-to-passthrough shape HashAggregateExec uses when
      // its hash map can't grow.
      val scanned = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size >= capL) {
          numPassThroughRows += 1
          Iterator.single(row)
        } else {
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kL + 1, ord.reverse)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kL) heap.offer(row.copy())
          else if (ord.compare(row, heap.peek) < 0) {
            heap.poll(); heap.offer(row.copy())
          }
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      // `++`'s right side is by-name: the heap flush builds only after
      // the scan (and therefore every heap update) has completed
      (scanned ++ heaps.values.asScala.iterator.flatMap(_.iterator.asScala))
        .map { r => numOutputRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Final: requires clustering on the group and a (group, order) sort —
  * EnsureRequirements inserts the exchange and sort — then emits the
  * first k rows of each group in one streaming pass.
  */
case class TopKPerGroupFinalExec(group: Seq[Attribute], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(group) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(group.map(SortOrder(_, Ascending)) ++ order)
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (groupL, kL, childOutput) = (group, k, child.output)
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupL, childOutput)
      var current: UnsafeRow = null
      var n = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (current == null || key != current) { current = key.copy(); n = 1 }
        else n += 1
        if (n <= kL) { numOutputRows += 1; true } else false
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Partial-side group cap: above this many distinct groups in one input
    * partition, further groups' rows pass through to the shuffle
    * unfiltered instead of growing the heap map. At k=3 and ~100 B/row
    * the cap bounds map-side memory near 80 MB regardless of input
    * cardinality (the group-count : partition-count ratio at 100 TB is
    * unknowable at plan time, so the bound must be a runtime degrade,
    * not a plan-time assumption).
    */
  val defaultPartialMaxGroups: Int = 1 << 18

  /** Top-k rows per group of `df`, ordered by `orderCols` (e.g.
    * `col("price").desc`). Output columns = input columns; within a
    * group rows come back in `orderCols` order.
    */
  def topK(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int, maxGroups: Int = defaultPartialMaxGroups): DataFrame = {
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKPerGroupStrategy)
    // route the order columns through the analyzer (a throwaway
    // sortWithinPartitions plan) to obtain RESOLVED catalyst SortOrders —
    // Spark 4's Column nodes only become catalyst expressions during
    // analysis, so converting them directly leaves unresolved (and
    // unserializable) wrappers in the plan
    val analyzedSort = Bridge.analyzed(df.sortWithinPartitions(orderCols: _*))
    val (order, child) = analyzedSort match {
      case s: Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"expected Sort from sortWithinPartitions, got: ${other.nodeName}")
    }
    def byName(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(",")}"))
    Bridge.ofRows(spark, TopKPerGroupNode(groupCols.map(byName), order, k,
      child, maxGroups))
  }
}
