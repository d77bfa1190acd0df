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

  test("random series: densification invariants hold (seeded property)") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- Seq("a", "b", "c", "d")
      day <- rnd.shuffle((0 until 120).toList).take(1 + rnd.nextInt(40)).sorted
    } yield (k, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(day)),
      rnd.nextInt(100).toDouble)
    val in = rows.toDF("k", "day", "v")
    val out = GapFill.dailyLocf(in, "k", "day", "v")
      .as[(String, Date, Double, Boolean)].collect().toSeq
    val byKey = rows.groupBy(_._1)
    out.groupBy(_._1).foreach { case (k, kRows) =>
      val obs = byKey(k).map(r => r._2.toLocalDate -> r._3).toMap
      val (d0, d1) = (obs.keys.min((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b)),
        obs.keys.max((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b)))
      // exactly one row per calendar day in [min, max]
      assert(kRows.map(_._2.toLocalDate).toSet ==
        Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toSet)
      assert(kRows.size == java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1)
      kRows.foreach { case (_, day, v, isGap) =>
        val d = day.toLocalDate
        assert(isGap == !obs.contains(d))
        // LOCF: value equals the latest observation at or before the day
        val src = Iterator.iterate(d)(_.minusDays(1)).find(obs.contains).get
        assert(v == obs(src))
      }
    }
  }

  test("plan is one window shuffle — no join, no second aggregate") {
    val plan = GapFill.dailyLocf(series, "k", "day", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert(plan.contains("Window"), plan)
  }
}
