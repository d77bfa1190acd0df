package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch funnel (q68): an ordered view→click→
  * purchase pattern per user, maintained incrementally with
  * `transformWithState` — and OUT-OF-ORDER-PROOF, which is the hard part
  * of streaming pattern matching. A naive state machine that advances on
  * arrival order breaks the moment a late view arrives with an earlier
  * timestamp (the click that "preceded" it may now qualify). This
  * processor instead keeps the minimal sufficient state —
  *   min(view ts)            as a ValueState,
  *   all click ts            as a ListState,
  *   all purchase ts         as a ListState
  * — and re-derives (t1, t2, t3) from it on every batch, so ANY arrival
  * order converges to the same funnel as the batch window cascade.
  *
  * Scale: state is O(#clicks + #purchases) per user in RocksDB (list
  * column family — appended, never materialized per batch except for the
  * per-user rescans, which are user-activity-sized). The third state
  * shape of the Spark 4 API after the profile demo's Value/Map.
  */
object FunnelStateOps {

  case class FEv(user_id: Long, ts: Long, event_type: String)
  /** -1 marks a stage not (yet) reached; n_seen is a monotone per-user
    * counter so tests can select the converged update-mode row.
    */
  case class FunnelRow(user_id: Long, t1: Long, t2: Long, t3: Long, n_seen: Long)

  class FunnelProcessor extends StatefulProcessor[Long, FEv, FunnelRow] {
    @transient private var minView: ValueState[Long] = _
    @transient private var clicks: ListState[Long] = _
    @transient private var purchases: ListState[Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      minView = getHandle.getValueState[Long]("min_view",
        Encoders.scalaLong, TTLConfig.NONE)
      clicks = getHandle.getListState[Long]("clicks",
        Encoders.scalaLong, TTLConfig.NONE)
      purchases = getHandle.getListState[Long]("purchases",
        Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[FEv],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      var mv = if (minView.exists()) minView.get() else Long.MaxValue
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        n += 1
        e.event_type match {
          case "view" => if (e.ts < mv) mv = e.ts
          case "click" => clicks.appendValue(e.ts)
          case "purchase" => purchases.appendValue(e.ts)
          case _ => ()
        }
      }
      minView.update(mv)
      seen.update(n)
      val t1 = if (mv == Long.MaxValue) -1L else mv
      val t2 = if (t1 < 0) -1L else {
        var best = Long.MaxValue
        val it = clicks.get()
        while (it.hasNext) { val t = it.next(); if (t > t1 && t < best) best = t }
        if (best == Long.MaxValue) -1L else best
      }
      val t3 = if (t2 < 0) -1L else {
        var best = Long.MaxValue
        val it = purchases.get()
        while (it.hasNext) { val t = it.next(); if (t > t2 && t < best) best = t }
        if (best == Long.MaxValue) -1L else best
      }
      Iterator.single(FunnelRow(user, t1, t2, t3, n))
    }
  }

  /** Per-user funnel state, one update-mode row per user per batch.
    * `events` needs user_id, ts (timestamp), event_type.
    */
  def userFunnels(events: DataFrame): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_type")
      .select($"user_id".as[Long], $"ts_us".as[Long], $"event_type".as[String])
      .map { case (u, t, tpe) => FEv(u, t, tpe) }
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
