package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Burst detection over an event stream — the time-axis data-quality
  * monitor beside [[Drift]]'s distribution axis: a per-key daily count
  * whose z-score against its own TRAILING window spikes past the
  * threshold marks a burst (scraper gone rogue, a source flooding the
  * ingest, a bot campaign) the moment it enters the data. The trailing
  * frame is a day-bounded RANGE frame over the CALENDAR (epoch-day
  * ordering, RANGE BETWEEN -trailing AND -1): only counts from the
  * last `trailing` calendar days enter the baseline, so a source that
  * pauses and resumes is never scored against an arbitrarily stale
  * baseline (a ROWS frame over observed rows would reach back across
  * the gap — the round-8 ADVICE finding, closed in round 9). The frame
  * deliberately EXCLUDES the current day, so a burst cannot suppress
  * its own baseline, and days with fewer than `minWindow` OBSERVED
  * (non-zero-event) days inside the calendar window or zero variance
  * are unscored rather than divided by zero — zero-event days are
  * absent from the counts, not zero-valued observations; a freshly
  * resumed source therefore warms up for `minWindow` active days
  * before it can be scored again, by design.
  *
  * Scale: one partial-agg count per (key, day) — the shuffle carries
  * day-granular aggregates, never events — then one window pass
  * partitioned by key (frames are at most `trailing` rows, state is
  * O(trailing) per key regardless of event volume). Hot keys are the
  * standard window-skew case; day-granular rows make even a
  * billion-event key a ~365-row frame problem.
  */
object Burst {

  /** Burst rows: (keyCol, day, n, z) for days whose z-score >=
    * `zThreshold` against the trailing `trailing`-day frame (needs >=
    * `minWindow` trailing days and positive variance; z rounded 6dp).
    */
  def dailyBursts(events: DataFrame, keyCol: String, tsCol: String,
      trailing: Int = 7, minWindow: Int = 3,
      zThreshold: Double = 2.0): DataFrame =
    burstsFromDailyCounts(
      events.groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
        .agg(count(lit(1)).as("n")),
      keyCol, trailing, minWindow, zThreshold)

  /** The scoring stage over PRE-AGGREGATED daily counts (keyCol, day,
    * n) — [[dailyBursts]] delegates here, and the streaming monitor
    * ([[graft.streaming.BurstMonitor]]) calls it on its accumulated
    * counts table: batch and streaming share one formula code path, so
    * their agreement is structural (DriftMonitor's contract, time
    * axis).
    */
  def burstsFromDailyCounts(counts: DataFrame, keyCol: String,
      trailing: Int = 7, minWindow: Int = 3,
      zThreshold: Double = 2.0): DataFrame = {
    require(trailing >= minWindow && minWindow >= 2,
      s"need trailing >= minWindow >= 2 (stddev of one point is " +
        s"undefined), got $trailing/$minWindow")
    // RANGE frame over epoch days: the baseline is the last `trailing`
    // CALENDAR days, not the last `trailing` observed rows — a quiet
    // gap empties the frame instead of letting stale days leak in
    val w = Window.partitionBy(keyCol)
      .orderBy(datediff(col("day"), lit("1970-01-01")))
      .rangeBetween(-trailing, -1)
    counts.select(col(keyCol), col("day"), col("n"),
        avg("n").over(w).as("__mu"),
        stddev_samp("n").over(w).as("__sd"),
        count(lit(1)).over(w).as("__nw"))
      .filter(col("__nw") >= minWindow && col("__sd") > 0)
      .withColumn("z", round((col("n") - col("__mu")) / col("__sd"), 6))
      .filter(col("z") >= zThreshold)
      .select(col(keyCol), col("day"), col("n"), col("z"))
  }
}
