package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via [KeyValue]GroupedDataset.*GroupsWithState
  * (reference status: streaming ABSENT). Keys partition the state store
  * exactly like a shuffle, so state scales with the key space, not the
  * stream length. NOTE: this demo keeps lifetime totals and so uses
  * NoTimeout — state grows with the number of distinct keys; a production
  * deployment over an unbounded key space would set EventTimeTimeout (+
  * watermark) and evict idle keys in the state function.
  */
object StatefulOps {

  case class UserActivity(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user activity totals maintained in the state store.
    * flatMapGroupsWithState(Update) emits the refreshed state for each
    * key touched by the micro-batch.
    */
  def runningUserTotals(events: DataFrame): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.select($"user_id".as[Long], $"value".as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserActivity, UserActivity](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Double)],
            state: GroupState[UserActivity]) => {
          val prev = state.getOption.getOrElse(UserActivity(user, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          rows.foreach { case (_, value) => n += 1; v += value }
          val next = UserActivity(user, n, v)
          state.update(next)
          Iterator(next)
        })
  }
}
