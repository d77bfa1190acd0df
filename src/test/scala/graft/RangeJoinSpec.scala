package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))

  test("binned interval join == naive range join, across bin widths") {
    val points = Seq.tabulate(200)(i => (i.toLong, s"p$i")).toDF("pt", "ptag")
    // overlapping, touching, empty, and point-sized intervals
    val intervals = Seq(
      (0L, 10L, "a"), (5L, 15L, "b"), (10L, 10L, "point"),
      (190L, 210L, "tail"), (300L, 310L, "empty"), (17L, 42L, "wide"))
      .toDF("lo", "hi", "itag")
    val expected = naive(points, intervals)
      .select("pt", "itag").as[(Long, String)].collect().toSet
    for (w <- Seq(1L, 3L, 8L, 64L, 1000L)) {
      val got = RangeJoin.binnedIntervalJoin(points, intervals,
          "pt", "lo", "hi", binWidth = w)
        .select("pt", "itag").as[(Long, String)].collect().toSet
      assert(got == expected, s"binWidth=$w")
      // exactly-one-bin-per-point => no dedup => multiplicities also match
      val gotRows = RangeJoin.binnedIntervalJoin(points, intervals,
        "pt", "lo", "hi", binWidth = w).count()
      assert(gotRows == expected.size.toLong, s"binWidth=$w multiplicity")
    }
  }

  test("negative domains bin correctly (floor division)") {
    val points = Seq(-10L, -8L, -1L, 0L, 1L).toDF("pt")
    val intervals = Seq((-9L, -2L, "neg"), (-1L, 1L, "zero"))
      .toDF("lo", "hi", "itag")
    val got = RangeJoin.binnedIntervalJoin(points, intervals,
        "pt", "lo", "hi", binWidth = 4L)
      .select("pt", "itag").as[(Long, String)].collect().toSet
    assert(got == Set((-8L, "neg"), (-1L, "zero"), (0L, "zero"), (1L, "zero")))
  }

  test("epoch-nanosecond domain bins exactly (no double precision loss)") {
    // values above 2^53: floor(x / w) in double would misbin these
    val base = 1700000000000000000L // ~2023 in epoch nanos
    val points = Seq(base + 1L, base + 999999999L, base + 1000000001L)
      .toDF("pt")
    val intervals = Seq((base, base + 1000000000L, "w1")).toDF("lo", "hi", "itag")
    val got = RangeJoin.binnedIntervalJoin(points, intervals,
        "pt", "lo", "hi", binWidth = 1000000000L)
      .select("pt").as[Long].collect().toSet
    assert(got == Set(base + 1L, base + 999999999L))
  }

  test("plan is an equi-join on the bin id — no BNLJ / cartesian") {
    val points = spark.range(1000).select(col("id").as("pt"))
    val intervals = spark.range(100)
      .select((col("id") * 10).as("lo"), (col("id") * 10 + 5).as("hi"))
    val plan = RangeJoin.binnedIntervalJoin(points, intervals,
        "pt", "lo", "hi", binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the naive predicate-only join, by contrast, IS a BNLJ
    val naivePlan = naive(points, intervals)
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("reserved bin column name is rejected") {
    val df = Seq(1L).toDF("__rj_bin")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedIntervalJoin(df.withColumnRenamed("__rj_bin", "pt")
        .withColumn("__rj_bin", lit(1L)), df, "pt", "lo", "hi", 1L)
    }
  }
}
