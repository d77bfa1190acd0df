package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewRank

/** The salted two-phase top-k contract (q75): salt invariance (any salt
  * count yields the unsalted window answer), the two-phase plan shape,
  * and the per-reducer state bound on a deliberately hot key.
  */
class SkewRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"v".desc, $"id")
    df.withColumn("rk", row_number().over(w)).filter($"rk" <= k).drop("rk")
  }

  // one hot key (g=0) with 20x the rows of every other key, plus ties
  private lazy val skewed = spark.range(26000).select(
    when($"id" < 20000, 0L).otherwise($"id" % 6).as("g"),
    ($"id" % 97).cast("double").as("v"),
    $"id".as("id")).repartition(4)

  test("salted top-k equals the plain window for every salt count") {
    val base = windowTopK(skewed, 5).as[(Long, Double, Long)].collect().toSet
    for (salts <- Seq(1, 3, 8)) {
      val got = SkewRank.topKSalted(skewed, Seq("g"), Seq($"v".desc, $"id"),
        k = 5, salts = salts, saltCols = Seq($"id"))
        .as[(Long, Double, Long)].collect().toSet
      assert(got == base, s"salts=$salts diverged from the window answer")
    }
    assert(base.size == 5 * 6)
  }

  test("plan is two TopKPerGroup phases; phase 1 clusters on (group, salt)") {
    val df = SkewRank.topKSalted(skewed, Seq("g"), Seq($"v".desc, $"id"),
      k = 5, salts = 8, saltCols = Seq($"id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE prints the tree twice (final + initial plan) — read the first
    // copy: outer line = phase-2 final, next = phase-1 final
    val finals = plan.linesIterator.filter(_.contains("TopKPerGroupFinal"))
      .toSeq.take(2)
    assert(finals.size == 2, s"expected two final phases in:\n$plan")
    // the lower (phase-1) final groups on the salt as well, so no single
    // reducer owns a whole hot group; the upper (phase-2) final does not
    assert(finals.last.contains("__graft_salt"),
      s"phase-1 final must cluster on the salt:\n$plan")
    assert(!finals.head.contains("__graft_salt"),
      s"phase-2 final must merge across salts:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("row_number"),
      s"no window sort-and-buffer path expected:\n$plan")
  }

  test("phase-2 per-group input is capped at salts*k for the hot key") {
    // phase 2's input is phase 1's output: count it directly — for the
    // hot group it must be <= salts*k even though the group has 20k rows
    val salts = 8; val k = 5
    val salted = skewed.withColumn("s", pmod(hash($"id"), lit(salts)))
    val phase1 = graft.plans.TopKPerGroup.topK(
      salted, Seq("g", "s"), Seq($"v".desc, $"id"), k)
    val perGroup = phase1.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(perGroup(0L) <= salts.toLong * k,
      s"hot group fed ${perGroup(0L)} rows into the merge")
    assert(perGroup(0L) > k,
      "hot group should span multiple salts (else the test is vacuous)")
  }

  test("degenerate cases: salts=1, tiny groups, k beyond group size") {
    val df = Seq((1L, 5.0, 1L), (1L, 5.0, 2L), (2L, 1.0, 3L))
      .toDF("g", "v", "id")
    val got = SkewRank.topKSalted(df, Seq("g"), Seq($"v".desc, $"id"),
      k = 10, salts = 4, saltCols = Seq($"id"))
      .as[(Long, Double, Long)].collect().toSet
    assert(got == Set((1L, 5.0, 1L), (1L, 5.0, 2L), (2L, 1.0, 3L)))
  }
}
