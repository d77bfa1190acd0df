package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful streaming via the Spark 4 `transformWithState`
  * operator (the successor API to *GroupsWithState: named state variables
  * of multiple shapes — value / list / map — timers, and TTL, all backed
  * by the RocksDB state store's column families).
  *
  * The demo keeps a per-user engagement profile in TWO state variables
  * (a MapState of per-event-type counts + a ValueState of running
  * totals), every update of which is order-independent — so with a
  * static replay the LAST update-mode row per user equals the batch
  * `groupBy(user).agg(countDistinct(type), count(*), max(value))`
  * exactly (TransformWithStateSpec pins this).
  *
  * Scale: state is partitioned by the grouping key like any shuffle;
  * per-user cost is O(#distinct types) in RocksDB, never materialized
  * per micro-batch. Requires
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
  * (the only provider with multi-column-family support).
  */
object TransformWithStateOps {

  case class Ev(user_id: Long, event_type: String, value: Double)
  case class Totals(n: Long, mx: Double)
  case class UserProfile(user_id: Long, n_types: Long, n_events: Long,
      max_value: Double)

  class ProfileProcessor extends StatefulProcessor[Long, Ev, UserProfile] {
    @transient private var typeCounts: MapState[String, Long] = _
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      typeCounts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      totals = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserProfile] = {
      var t = if (totals.exists()) totals.get() else Totals(0L, Double.MinValue)
      rows.foreach { e =>
        val c = if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, c + 1)
        t = Totals(t.n + 1, math.max(t.mx, e.value))
      }
      totals.update(t)
      Iterator.single(UserProfile(user, typeCounts.keys().size, t.n, t.mx))
    }
  }

  /** Per-user (n_distinct_types, n_events, max_value) profile, one
    * update-mode row per user per micro-batch.
    */
  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .select($"user_id".as[Long], $"event_type".as[String],
        $"value".as[Double])
      .map { case (u, tpe, v) => Ev(u, tpe, v) }
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
