package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch twin of Structured Streaming's
  * `session_window`; reference status: streaming ABSENT, SURVEY.md §2.4).
  *
  * Scale design: one shuffle on the key, two window passes over the same
  * partitioning (Spark reuses the exchange), then a hash agg keyed by
  * (key, session) — linear, no self-join.
  */
object Sessionize {

  /** Collapse per-key event streams into sessions separated by gaps of
    * more than `gapSeconds`. Returns one row per session:
    * key, session_start_epoch, session_end_epoch, n_events.
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(tsCol)
    val epoch = unix_timestamp(col(tsCol))
    events
      .withColumn("__gap",
        when(epoch - lag(epoch, 1).over(byTime) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("__session",
        sum(col("__gap")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__session"))
      .agg(
        min(epoch).as("session_start"),
        max(epoch).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__session")
  }
}
