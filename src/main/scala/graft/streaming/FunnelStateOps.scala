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
  *   candidate click ts      as a ListState,
  *   candidate purchase ts   as a ListState
  * — and re-derives (t1, t2, t3) from it on every batch, so ANY arrival
  * order converges to the same funnel as the batch window cascade.
  *
  * State is BOUNDED by semantic pruning ([[deriveAndPrune]]), which is
  * exact, not time-based (a 100 TB clickstream's eternal users must not
  * accumulate forever): t1 = min view only ever DECREASES, so t2 = min
  * click > t1 is monotone non-increasing — a click above the current t2
  * can never be selected by any future arrival, and is EVICTED every
  * batch; likewise purchases above t3. The lists are also deduplicated,
  * so at-least-once replays that re-append the same timestamps are
  * no-ops. Retained size is the distinct timestamps at-or-below the
  * current selection (exactly the set a late earlier view could still
  * promote) — for a completed funnel that is a handful of values, and
  * it never grows again. The pruning's convergence under arbitrary
  * arrival order, replays and chunking is property-tested.
  *
  * A store-level TTL is additionally available as an opt-in
  * (`listTtl = Some(d)`) for production streams with a real trigger
  * cadence: it evicts the candidate lists of users silent longer than
  * `d` (a late arrival after expiry re-derives from what it can see —
  * the watermark-drop contract). It is NOT the default because state
  * TTL requires TimeMode.ProcessingTime, in which the operator keeps
  * scheduling time-advancing micro-batches — measured >1000 empty
  * batches in 120 s on a fully-drained source, so drain-to-quiesce
  * semantics (processAllAvailable / Trigger.AvailableNow) never
  * terminate.
  *
  * The WATERMARK prune (`watermarkDelay = Some("10 minutes")`) closes
  * that gap without wall-clock eviction: with an event-time watermark W
  * on the stream, any retained candidate with ts < W that is not the
  * current pick can be dropped EXACTLY ([[watermarkPrune]]):
  *   - a retained non-pick click c sits at or below t1 (the pick is the
  *     unique retained click above t1); promoting it requires a future
  *     view v < c < W — which the watermark drops;
  *   - a retained non-pick purchase p sits at or below t2; promoting it
  *     requires t2 to drop below p, i.e. a new click above the watermark
  *     (> W > p — impossible) or an existing click promoted by a view
  *     v < c < p < W — dropped again.
  * So per-user state converges to the two scalars plus the pick
  * timestamps — O(1) — once the watermark passes the funnel. Users
  * silent after a batch are swept by an EVENT-TIME timer (registered
  * just above the current watermark, re-armed only while non-pick
  * candidates remain): event-time timers fire as data advances the
  * watermark, so the query still quiesces under processAllAvailable /
  * Trigger.AvailableNow — removing the TTL mode's caveat. This is the
  * recommended production mode; the algebraic prune remains the
  * always-on floor when no watermark is configured.
  */
object FunnelStateOps {

  case class FEv(user_id: Long, ts: Long, event_type: String)
  /** -1 marks a stage not (yet) reached; n_seen is a monotone per-user
    * DELIVERY counter — it increments for every arrival, including
    * at-least-once replays (the replay-is-a-no-op property holds for
    * the funnel picks, whose candidate lists are deduplicated, not for
    * this counter). It exists so tests can select the converged
    * update-mode row, not as a distinct-event count.
    */
  case class FunnelRow(user_id: Long, t1: Long, t2: Long, t3: Long, n_seen: Long)

  /** Pure funnel re-derivation + minimal retention — the per-user batch
    * step, factored out so the pruning contract is directly testable:
    * returns (t1, t2, t3, retainedClicks, retainedPurchases) where the
    * retained lists are distinct+sorted and contain only timestamps
    * that a FUTURE arrival could still select (≤ the current pick;
    * everything if nothing qualifies yet).
    */
  def deriveAndPrune(minView: Long, clicks: Seq[Long], purchases: Seq[Long])
      : (Long, Long, Long, Seq[Long], Seq[Long]) = {
    val cs = clicks.distinct.sorted
    val ps = purchases.distinct.sorted
    val t1 = if (minView == Long.MaxValue) -1L else minView
    val t2 = if (t1 < 0) -1L else cs.find(_ > t1).getOrElse(-1L)
    val t3 = if (t2 < 0) -1L else ps.find(_ > t2).getOrElse(-1L)
    val keepC = if (t2 < 0) cs else cs.filter(_ <= t2)
    val keepP = if (t3 < 0) ps else ps.filter(_ <= t3)
    (t1, t2, t3, keepC, keepP)
  }

  /** Exact watermark eviction for one candidate list (object scaladoc
    * has the promotion argument): a non-pick candidate strictly below
    * the watermark can only ever be selected after an arrival that the
    * watermark already drops. `>=` (not `>`) keeps the boundary row,
    * which stays safe even if the engine admits ts == W arrivals.
    */
  def watermarkPrune(pick: Long, xs: Seq[Long], wm: Long): Seq[Long] =
    xs.filter(x => x >= wm || x == pick)

  class FunnelProcessor(listTtl: Option[java.time.Duration],
      watermarkSweep: Boolean = false)
      extends StatefulProcessor[Long, FEv, FunnelRow] {
    @transient private var minView: ValueState[Long] = _
    @transient private var clicks: ListState[Long] = _
    @transient private var purchases: ListState[Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // the two scalars are O(1) per user; the LISTS are bounded by the
      // per-batch deriveAndPrune rewrite (see object scaladoc) plus the
      // optional store TTL
      val listCfg = listTtl.map(new TTLConfig(_)).getOrElse(TTLConfig.NONE)
      minView = getHandle.getValueState[Long]("min_view",
        Encoders.scalaLong, TTLConfig.NONE)
      clicks = getHandle.getListState[Long]("clicks",
        Encoders.scalaLong, listCfg)
      purchases = getHandle.getListState[Long]("purchases",
        Encoders.scalaLong, listCfg)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[FEv],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      var mv = if (minView.exists()) minView.get() else Long.MaxValue
      var n = if (seen.exists()) seen.get() else 0L
      val newClicks = Seq.newBuilder[Long]
      val newPurchases = Seq.newBuilder[Long]
      rows.foreach { e =>
        n += 1
        e.event_type match {
          case "view" => if (e.ts < mv) mv = e.ts
          case "click" => newClicks += e.ts
          case "purchase" => newPurchases += e.ts
          case _ => ()
        }
      }
      val (t1, t2, t3, keepC0, keepP0) = deriveAndPrune(mv,
        clicks.get().toSeq ++ newClicks.result(),
        purchases.get().toSeq ++ newPurchases.result())
      minView.update(mv)
      seen.update(n)
      val (keepC, keepP) = applyWatermark(t2, t3, keepC0, keepP0, timerValues)
      writeLists(keepC, keepP, t2, t3, timerValues)
      Iterator.single(FunnelRow(user, t1, t2, t3, n))
    }

    /** Event-time sweep for silent users: re-derive from state alone,
      * evict what the (now higher) watermark proves unselectable, and
      * re-arm only while non-pick candidates remain — so the timer
      * chain self-extinguishes at the O(1) floor. Emits nothing: the
      * funnel picks cannot have changed without an arrival.
      */
    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[FunnelRow] = {
      val mv = if (minView.exists()) minView.get() else Long.MaxValue
      val (_, t2, t3, keepC0, keepP0) = deriveAndPrune(mv,
        clicks.get().toSeq, purchases.get().toSeq)
      val (keepC, keepP) = applyWatermark(t2, t3, keepC0, keepP0, timerValues)
      writeLists(keepC, keepP, t2, t3, timerValues)
      Iterator.empty
    }

    private def applyWatermark(t2: Long, t3: Long, keepC: Seq[Long],
        keepP: Seq[Long], timerValues: TimerValues): (Seq[Long], Seq[Long]) = {
      val wmMs = if (watermarkSweep) timerValues.getCurrentWatermarkInMs else 0L
      if (wmMs <= 0L) (keepC, keepP) // no watermark yet: algebraic floor only
      else (watermarkPrune(t2, keepC, wmMs * 1000L),
        watermarkPrune(t3, keepP, wmMs * 1000L))
    }

    private def writeLists(keepC: Seq[Long], keepP: Seq[Long],
        t2: Long, t3: Long, timerValues: TimerValues): Unit = {
      // put() (not append) writes back the deduped, pruned lists
      if (keepC.isEmpty) clicks.clear() else clicks.put(keepC.toArray)
      if (keepP.isEmpty) purchases.clear() else purchases.put(keepP.toArray)
      if (watermarkSweep) {
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        val pending = keepC.exists(_ != t2) || keepP.exists(_ != t3)
        // fire on the next watermark advance past "now"
        if (pending) getHandle.registerTimer(
          math.max(timerValues.getCurrentWatermarkInMs, 0L) + 1L)
      }
    }
  }

  /** Per-user funnel state, one update-mode row per user per batch.
    * `events` needs user_id, ts (timestamp), event_type.
    *
    * `watermarkDelay = Some("10 minutes")` is the recommended production
    * mode: sets an event-time watermark on `ts` and enables the exact
    * watermark prune + silent-user event-time sweep (object scaladoc) —
    * per-user state converges to O(1) and the query still quiesces
    * under drain-to-completion triggers. Correctness then carries the
    * standard watermark contract: arrivals later than the delay are
    * outside the guarantee.
    *
    * `listTtl = Some(d)` instead evicts silent users' candidate lists
    * after `d` of processing time — opt-in, continuous-trigger
    * deployments only (see the object scaladoc for why it cannot be
    * the default). The two modes are mutually exclusive.
    */
  def userFunnels(events: DataFrame,
      listTtl: Option[java.time.Duration] = None,
      watermarkDelay: Option[String] = None): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    require(listTtl.isEmpty || watermarkDelay.isEmpty,
      "listTtl (ProcessingTime TTL) and watermarkDelay (EventTime prune) are exclusive")
    val timeMode = // state TTL is only legal in ProcessingTime mode
      if (watermarkDelay.isDefined) TimeMode.EventTime()
      else if (listTtl.isDefined) TimeMode.ProcessingTime()
      else TimeMode.None()
    val src = watermarkDelay.map(events.withWatermark("ts", _)).getOrElse(events)
    src
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_type")
      .select($"user_id".as[Long], $"ts_us".as[Long], $"event_type".as[String])
      .map { case (u, t, tpe) => FEv(u, t, tpe) }
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(listTtl, watermarkDelay.isDefined),
        timeMode, OutputMode.Update())
  }
}
