package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Burst

/** Burst detection (p67): a planted spike is flagged with the hand-
  * computed z, the trailing frame excludes the spike's own day, thin
  * windows and flat (zero-variance) baselines are unscored, and guards.
  */
class BurstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-02-$d%02d 12:00:00")

  /** nPerDay(i) events of one type on day i (1-based Feb days). */
  private def events(key: String, nPerDay: Seq[Int]) =
    nPerDay.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)((key, day(i + 1)))
    }

  test("a planted spike is flagged with the hand-computed z-score") {
    // baseline alternates 4/6 (mean 5, stddev_samp of [4,6,4,6,4,6,4]
    // = 1.069045...), then day 8 spikes to 20: z = (20-4.857142857)/sd
    val rows = events("click", Seq(4, 6, 4, 6, 4, 6, 4, 20))
      .toDF("event_type", "ts")
    val out = Burst.dailyBursts(rows, "event_type", "ts",
        trailing = 7, minWindow = 3, zThreshold = 2.0)
      .as[(String, java.sql.Date, Long, Double)].collect()
    assert(out.length == 1)
    val (_, d, n, z) = out.head
    assert(d.toString == "2024-02-08" && n == 20L)
    val base = Seq(4, 6, 4, 6, 4, 6, 4).map(_.toDouble)
    val mu = base.sum / base.size
    val sd = math.sqrt(base.map(x => (x - mu) * (x - mu)).sum / (base.size - 1))
    assert(z == BigDecimal((20 - mu) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("the trailing frame excludes the current day — a burst cannot dilute itself") {
    // with the spike day INSIDE its own baseline the z would shrink
    // below threshold; the exclusive frame keeps it flagged even when
    // the spike is modest
    val rows = events("view", Seq(5, 5, 6, 5, 6, 5, 6, 9))
      .toDF("event_type", "ts")
    val out = Burst.dailyBursts(rows, "event_type", "ts",
        zThreshold = 2.0)
      .as[(String, java.sql.Date, Long, Double)].collect()
    assert(out.map(_._2.toString).toSeq == Seq("2024-02-08"))
  }

  test("thin windows and zero-variance baselines are unscored, not flagged or crashed") {
    // only 2 trailing days before the spike -> below minWindow
    val thin = events("a", Seq(5, 5, 50)).toDF("event_type", "ts")
    assert(Burst.dailyBursts(thin, "event_type", "ts").count() == 0)
    // perfectly flat baseline -> sd = 0 -> unscored, no division
    val flat = events("b", Seq(5, 5, 5, 5, 5, 50)).toDF("event_type", "ts")
    assert(Burst.dailyBursts(flat, "event_type", "ts").count() == 0)
  }

  test("a paused-and-resumed source is not scored against its stale baseline") {
    // active days 1-7, quiet days 8-19, spike on day 20: a ROWS frame
    // would reach back across the gap and score the spike against the
    // 12-day-old baseline; the calendar-day RANGE frame holds zero
    // trailing observations and leaves the day unscored (round-8 ADVICE)
    val gap = (events("s", Seq(5, 6, 5, 6, 5, 6, 5)) ++
        Seq.fill(50)(("s", day(20)))).toDF("event_type", "ts")
    assert(Burst.dailyBursts(gap, "event_type", "ts",
      trailing = 7, minWindow = 3, zThreshold = 2.0).count() == 0)
    // the same spike WITH a live trailing window still flags: days
    // 14-19 re-warm the baseline, day 20 is scored against them only
    val resumed = (events("s", Seq(5, 6, 5, 6, 5, 6, 5)) ++
        Seq(14, 15, 16, 17, 18, 19).flatMap(d =>
          Seq.fill(5 + d % 2)(("s", day(d)))) ++
        Seq.fill(50)(("s", day(20)))).toDF("event_type", "ts")
    val out = Burst.dailyBursts(resumed, "event_type", "ts",
        trailing = 7, minWindow = 3, zThreshold = 2.0)
      .as[(String, java.sql.Date, Long, Double)].collect()
    assert(out.map(_._2.toString).toSeq == Seq("2024-02-20"))
    // and its z is computed from the POST-GAP days alone
    val base = Seq(14, 15, 16, 17, 18, 19).map(d => (5 + d % 2).toDouble)
    val mu = base.sum / base.size
    val sd = math.sqrt(base.map(x => (x - mu) * (x - mu)).sum / (base.size - 1))
    assert(out.head._4 == BigDecimal((50 - mu) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("degenerate window parameters are rejected") {
    val rows = events("x", Seq(1)).toDF("event_type", "ts")
    intercept[IllegalArgumentException] {
      Burst.dailyBursts(rows, "event_type", "ts", trailing = 2,
        minWindow = 3)
    }
    intercept[IllegalArgumentException] {
      Burst.dailyBursts(rows, "event_type", "ts", minWindow = 1)
    }
  }
}
