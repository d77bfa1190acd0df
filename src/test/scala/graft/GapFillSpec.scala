package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GapFill

class GapFillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val series = Seq(
    ("a", d("2024-01-01"), 1.0),
    ("a", d("2024-01-04"), 4.0), // 2-day gap before
    ("a", d("2024-01-05"), 5.0),
    ("b", d("2024-03-10"), 9.0)) // singleton key
    .toDF("k", "day", "v")

  test("gap days are generated with the last observation carried forward") {
    val got = GapFill.dailyLocf(series, "k", "day", "v")
      .orderBy("k", "day")
      .as[(String, Date, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", d("2024-01-01"), 1.0, false),
      ("a", d("2024-01-02"), 1.0, true),
      ("a", d("2024-01-03"), 1.0, true),
      ("a", d("2024-01-04"), 4.0, false),
      ("a", d("2024-01-05"), 5.0, false),
      ("b", d("2024-03-10"), 9.0, false)))
  }

  test("dense series round-trips unchanged (no gaps fabricated)") {
    val dense = Seq(("a", d("2024-01-01"), 1.0), ("a", d("2024-01-02"), 2.0))
      .toDF("k", "day", "v")
    val got = GapFill.dailyLocf(dense, "k", "day", "v")
    assert(got.filter(col("is_gap")).count() == 0)
    assert(got.count() == 2)
  }

  test("plan is one window shuffle — no join, no second aggregate") {
    val plan = GapFill.dailyLocf(series, "k", "day", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert(plan.contains("Window"), plan)
  }
}
