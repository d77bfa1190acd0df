package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GenSource

class GenSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gen(rows: Long, slices: Int = 8) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows).option("slices", slices).load()

  test("full scan: schema, count, and deterministic per-row values") {
    val df = gen(1000, 4)
    assert(df.schema.fieldNames.toSeq == Seq("id", "bucket", "val", "tag"))
    assert(df.count() == 1000)
    val r = df.filter($"id" === 7L).head()
    assert(r.getLong(0) == 7L)
    assert(r.getInt(1) == GenSource.bucket(7))
    assert(r.getDouble(2) == GenSource.value(7))
    assert(r.getString(3) == GenSource.tag(7))
  }

  test("id filters reach the connector as a pushed range") {
    val df = gen(100000, 8).filter($"id" >= 90000L && $"id" < 95000L)
    assert(df.count() == 5000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedRange: [90000, 95000)"),
      s"range not pushed:\n$plan")
  }

  test("column pruning reaches the reader schema") {
    // a plain projection (grouped aggregates now take the pushdown
    // scan, which has no row-reader schema to prune)
    val df = gen(1000, 4).select("bucket")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<bucket:int>"),
      s"bucket-only read schema not pushed:\n$plan")
  }

  test("slices control scan parallelism; non-id filters stay post-scan") {
    assert(gen(1000, 4).rdd.getNumPartitions == 4)
    // bucket filter is not pushable: connector keeps the full range and
    // Spark applies the predicate post-scan — result must still be exact
    val got = gen(1000, 2).filter($"bucket" === 5).count()
    val exp = (0L until 1000L).count(GenSource.bucket(_) == 5)
    assert(got == exp && exp > 0)
  }

  test("contradictory range yields an empty scan, not an error") {
    assert(gen(1000).filter($"id" >= 900L && $"id" < 100L).count() == 0)
  }

  test("complete aggregate pushdown: count/min/max answer from range arithmetic") {
    import org.apache.spark.sql.functions.{count => cnt, lit, max, min}
    val df = gen(500000, 8).filter($"id" >= 100000L && $"id" < 400000L)
      .agg(cnt(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GenAggScan"), s"aggregate not pushed:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown must leave no aggregate node:\n$plan")
    assert(df.as[(Long, Long, Long)].head() == ((300000L, 100000L, 399999L)))
  }

  test("unsupported aggregates decline the pushdown and stay exact") {
    import org.apache.spark.sql.functions.{round => rnd, sum}
    // sum(val) is not a closed form over the range — the connector must
    // refuse and the generate-and-aggregate plan must produce the truth
    val df = gen(2000, 4).filter($"id" < 1000L)
      .agg(rnd(sum("val"), 6).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("GenAggScan"), s"sum must not be pushed:\n$plan")
    val exp = math.rint((0L until 1000L).map(GenSource.value).sum * 1e6) / 1e6
    assert(df.as[Double].head() == exp)
    // grouped COMPLETE pushdown is never claimed (grouping needs real
    // rows): grouped queries take the PARTIAL scan, not GenAggScan
    val grouped = gen(1000, 4).groupBy("bucket").count()
    assert(!grouped.queryExecution.executedPlan.toString.contains(" GenAggScan"))
  }

  test("partial grouped pushdown: per-slice group partials + engine final merge") {
    import org.apache.spark.sql.functions.{count => cnt, lit, max, min}
    val df = gen(100000, 8).filter($"id" >= 20000L && $"id" < 80000L)
      .groupBy("bucket")
      .agg(cnt(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GenGroupAggScan"),
      s"grouped aggregate not pushed as partials:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"partial pushdown must keep the engine's FINAL aggregate:\n$plan")
    // exact answers vs a driver recompute over the generator functions
    val ids = 20000L until 80000L
    val exp = ids.groupBy(GenSource.bucket).map { case (b, g) =>
      (b, (g.size.toLong, g.min, g.max)) }
    val got = df.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp)
    // the boundary-crossing claim: the scan emits at most
    // groups x partitions rows, not the 60k generated ids
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val scanRows = allNodes(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.metrics("numOutputRows").value }
      .sum
    assert(scanRows <= 100L * 8 && scanRows > 0,
      s"scan must emit group partials, got $scanRows rows")
    // tag grouping pushes too; val grouping declines and stays exact
    val byTag = gen(1000, 4).groupBy("tag").count()
    assert(byTag.queryExecution.executedPlan.toString
      .contains("GenGroupAggScan"))
    assert(byTag.as[(String, Long)].collect().toMap ==
      (0L until 1000L).groupBy(GenSource.tag).view.mapValues(_.size.toLong).toMap)
    val byVal = gen(1000, 4).groupBy("val").count()
    assert(!byVal.queryExecution.executedPlan.toString
      .contains("GenGroupAggScan"))
    assert(byVal.count() ==
      (0L until 1000L).map(GenSource.value).distinct.size)
  }

  test("aggregate pushdown over an empty range: count 0, null min/max") {
    import org.apache.spark.sql.functions.{count => cnt, lit, max, min}
    val df = gen(1000, 4).filter($"id" >= 900L && $"id" < 100L)
      .agg(cnt(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"))
    val row = df.collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1) && row.isNullAt(2),
      row.toString)
  }
}
