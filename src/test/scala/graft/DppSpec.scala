package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Registry

/** Dynamic partition pruning (q87): the fact scan must carry a runtime
  * pruning subquery on the partition column and READ only the dim-selected
  * partitions — pruned at the directory level, not row-filtered.
  */
class DppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fact scan carries a dynamicpruning filter and reads only January partitions") {
    val q = Registry.byName("q87_dynamic_partition_pruning")
    val df = q.run(spark, TestSpark.sf0001)
    df.collect() // execute: DPP metrics and subquery results materialize
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case other => other.children.flatMap(flatten) ++
        other.subqueries.flatMap(flatten)
    })
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.metadata
        .get("Location").exists(_.contains("graft_q87_fact")) => f
    }
    assert(scans.nonEmpty, "fact parquet scan not found")
    val fact = scans.head
    assert(fact.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"no dynamic pruning filter on the fact scan: ${fact.partitionFilters}")
    // directory-level proof: partitions read == January months, < all months
    val lineitem = graft.api.Tables.t(spark, TestSpark.sf0001, "lineitem")
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"))
    val allMonths = lineitem.distinct().count()
    val janMonths = lineitem.filter(col("m").endsWith("-01"))
      .distinct().count()
    assert(janMonths < allMonths, "fixture must span non-January months")
    val partsRead = fact.metrics("numPartitions").value
    assert(partsRead == janMonths,
      s"expected $janMonths partitions read, got $partsRead (of $allMonths)")
  }
}
