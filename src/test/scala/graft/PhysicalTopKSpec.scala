package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerGroup

class PhysicalTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  test("custom TopKPerGroup == window row_number formulation") {
    val custom = TopKPerGroup.topK(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
      .as[(Long, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val declarative = orders.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).drop("rk")
      .as[(Long, Long, Double)].collect().toSet
    assert(custom == declarative)
    assert(custom.nonEmpty)
  }

  test("plan contains the custom physical nodes with the exchange between them") {
    val df = TopKPerGroup.topK(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"), s"no final node in:\n$plan")
    assert(plan.contains("TopKPerGroupPartial"), s"no partial node in:\n$plan")
    // partial must sit below the exchange (map-side), final above it
    val lines = plan.linesIterator.toSeq
    val fi = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    val ei = lines.indexWhere(_.contains("Exchange"))
    val pi = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    assert(fi < ei && ei < pi,
      s"expected Final above Exchange above Partial, got:\n$plan")
  }

  test("map-side partial caps rows entering the shuffle at k per (group, partition)") {
    // 4 input partitions x 10 groups x 100 rows each: the window
    // formulation shuffles all 4000 rows; partial top-k emits at most
    // k * groups * partitions = 120
    val big = spark.range(4000).select(
      (col("id") % 10).as("g"),
      col("id").as("v")).repartition(4)
    val custom = TopKPerGroup.topK(big, Seq("g"), Seq($"v".asc), 3)
    custom.collect()
    // descend through the AQE wrapper and materialized query stages
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findAll(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => findAll(a.executedPlan)
      case q: QueryStageExec => findAll(q.plan)
      case _ => p.children.flatMap(findAll)
    })
    val partial = findAll(custom.queryExecution.executedPlan)
      .collectFirst { case t: graft.plans.TopKPerGroupPartialExec => t }
    assert(partial.nonEmpty, "no TopKPerGroupPartialExec in executed plan")
    val shuffled = partial.get.metrics("numOutputRows").value
    assert(shuffled > 0, "metric should reflect the executed plan")
    assert(shuffled <= 3L * 10 * 4,
      s"shuffle carried $shuffled rows; partial top-k should cap at 120")
    // and the result is still exactly the k smallest per group
    val got = custom.as[(Long, Long)].collect().toSet
    val exp = (0L until 10L).flatMap(g => (0 until 3).map(i => (g, g + 10L * i))).toSet
    assert(got == exp)
  }

  test("partial group cap degrades to passthrough without changing results") {
    // 10 groups but cap=2: at most 2 heaps per partition; every other
    // group's rows stream to the shuffle unfiltered and the final exec
    // alone ranks them — results must be identical to the uncapped run
    val big = spark.range(4000).select(
      (col("id") % 10).as("g"), col("id").as("v")).repartition(4)
    val capped = TopKPerGroup.topK(big, Seq("g"), Seq($"v".asc), 3, maxGroups = 2)
    // collect() on THIS Dataset: .as[...] would build a fresh
    // QueryExecution and the metrics below would read a never-run plan
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = (0L until 10L).flatMap(g => (0 until 3).map(i => (g, g + 10L * i))).toSet
    assert(got == exp)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findAll(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => findAll(a.executedPlan)
      case q: QueryStageExec => findAll(q.plan)
      case _ => p.children.flatMap(findAll)
    })
    val partial = findAll(capped.queryExecution.executedPlan)
      .collectFirst { case t: graft.plans.TopKPerGroupPartialExec => t }.get
    info(s"maxGroups=${partial.maxGroups} metrics=${partial.metrics.view.mapValues(_.value).toMap}")
    val passed = partial.metrics("numPassThroughRows").value
    assert(passed > 0, "cap=2 with 10 groups/partition must trigger passthrough")
    // tracked groups still filter: shuffle volume < full input
    assert(partial.metrics("numOutputRows").value < 4000)
  }

  test("RankLimitRewrite plans the declarative row_number filter as the custom operator") {
    import graft.plans.RankLimitRewrite
    RankLimitRewrite.enable(spark)
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      def declarative = orders.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3).drop("rk")
      val rewritten = declarative
      val got = rewritten.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroupPartial"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("WindowGroupLimit") && !plan.contains("row_number()"),
        s"built-in window path should be fully replaced:\n$plan")
      spark.conf.set(RankLimitRewrite.flag, "false")
      val base = declarative.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == base)
      assert(got.nonEmpty)
    } finally spark.conf.set(RankLimitRewrite.flag, "false")
  }

  test("RankLimitRewrite stays conservative when the rank column escapes") {
    import graft.plans.RankLimitRewrite
    RankLimitRewrite.enable(spark)
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      val keepsRank = orders.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3) // rk kept in output -> no rewrite
      keepsRank.collect()
      val plan = keepsRank.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerGroupPartial"), s"must not fire:\n$plan")
      assert(plan.contains("row_number()"), s"window path expected:\n$plan")
    } finally spark.conf.set(RankLimitRewrite.flag, "false")
  }

  test("ties, k larger than group size, and single-row groups") {
    val df = Seq((1L, 5.0), (1L, 5.0), (1L, 4.0), (2L, 1.0)).toDF("g", "v")
    val got = TopKPerGroup.topK(df, Seq("g"), Seq($"v".desc), 10)
      .as[(Long, Double)].collect().sorted
    assert(got.toSeq == Seq((1L, 4.0), (1L, 5.0), (1L, 5.0), (2L, 1.0)))
  }
}
