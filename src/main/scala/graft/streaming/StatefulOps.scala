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

  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long)

  /** Streaming twin of [[graft.operators.Sessionize]]: per-user gap-based
    * sessions maintained in the state store, closed and emitted when the
    * event-time watermark passes the session end + gap (EventTimeTimeout
    * — state for idle keys is evicted, which is what bounds the store on
    * an unbounded key space).
    *
    * Emission semantics (two paths): a session closed by a LATER event of
    * the same user (gap exceeded) is emitted immediately in that
    * micro-batch; a session with no successor is emitted when its timeout
    * fires. With a static input, each user's final session therefore stays
    * open iff its end + gap is within the terminal watermark.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      // the watermarked TIMESTAMP column itself must reach the stateful
      // operator (event-time timeout validation); epoch conversion happens
      // inside the state function
      .select($"user_id".as[Long], $"ts".as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, tsRows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) => {
          val rows = tsRows.map { case (u, t) => (u, t.getTime / 1000) }
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.end, s.n))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { sec =>
              cur match {
                case Some(s) if sec - s.end <= gapSeconds =>
                  cur = Some(SessionState(s.start, math.max(s.end, sec), s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.end, s.n)
                  cur = Some(SessionState(sec, sec, 1))
                case None =>
                  cur = Some(SessionState(sec, sec, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes end-of-session + gap
              state.setTimeoutTimestamp((s.end + gapSeconds) * 1000)
            }
            closed.reverseIterator
          }
        })
  }

  case class LocfState(lastDay: Int, lastValue: Double)
  case class FilledDay(user_id: Long, day: java.sql.Date, day_value: Double,
      is_gap: Boolean)

  /** Streaming twin of [[graft.operators.GapFill]] over per-user daily
    * event-value sums: every gap row is determined by a pair of
    * CONSECUTIVE observations, so it is emitted in-band when the later
    * observation arrives — no timeout path. Streamed output equals the
    * batch twin minus each user's final observed day (it has no
    * successor yet; it emits when one arrives — the spec pins this
    * equality exactly).
    *
    * Late data: an observation at or before the key's last-seen day is
    * dropped (the days it would revise were already emitted) — the same
    * contract as watermark dedup. State is two scalars per user.
    */
  def gapFillStream(events: DataFrame): Dataset[FilledDay] = {
    import events.sparkSession.implicits._
    events
      .select($"user_id".as[Long],
        to_date($"ts").as("day").as[java.sql.Date], $"value".as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState[LocfState, FilledDay](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Date, Double)],
            state: GroupState[LocfState]) => {
          def epochDay(d: java.sql.Date): Int = d.toLocalDate.toEpochDay.toInt
          def date(ed: Int): java.sql.Date =
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(ed.toLong))
          // daily sums of this batch, ascending by day
          val days = rows.toSeq.groupBy(r => epochDay(r._2)).view
            .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
          var cur = state.getOption
          val out = Seq.newBuilder[FilledDay]
          days.foreach { case (d, v) =>
            cur match {
              case Some(s) if d <= s.lastDay => // late observation: dropped
              case Some(s) =>
                // emit the predecessor, then its gap days up to d
                out += FilledDay(user, date(s.lastDay), s.lastValue,
                  is_gap = false)
                ((s.lastDay + 1) until d).foreach { g =>
                  out += FilledDay(user, date(g), s.lastValue, is_gap = true)
                }
                cur = Some(LocfState(d, v))
              case None =>
                cur = Some(LocfState(d, v))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
        })
  }

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
