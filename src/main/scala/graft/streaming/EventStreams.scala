package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over event streams (SURVEY gap ledger: the
  * reference has no streaming; this is the [EXT] streaming surface).
  *
  * Each transform takes a streaming DataFrame (`readStream` source or
  * MemoryStream in tests) with schema
  * `(event_id long, ev_ts timestamp, user_id long, event_type string,
  * value double)` and is the incremental twin of a batch query in
  * [[EventQueries]] — StreamingSpec asserts batch/stream agreement.
  *
  * Scale posture: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min dropped, state evicted); sessionization state is
  * per-user and evicted on the processing-time gap timeout, so state size
  * tracks active users, not history.
  */
object EventStreams {

  /** Tumbling 1-hour counts/sums per event type with a 10-minute watermark —
    * the streaming twin of q24_tumbling_window.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ev_ts", "10 minutes")
      .groupBy(window(col("ev_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"),
        col("total"))

  /** Sliding 1-hour windows every 15 minutes per event type — the
    * overlapping-window twin of [[tumblingAgg]] (each event lands in 4
    * windows; state is still watermark-bounded: 4× the tumbling state, not
    * history-proportional). Batch twin: q51_sliding_window.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ev_ts", "10 minutes")
      .groupBy(window(col("ev_ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"),
        col("total"))

  /** Streaming dedup of replayed event_ids (the streaming twin of the batch
    * L1 dedup). `dropDuplicatesWithinWatermark` ties each key's dedup state
    * to the watermark so it is actually evicted — plain
    * `dropDuplicates("event_id")` (no event-time column in the key) would
    * keep every id forever and grow state unboundedly. The dedup guarantee
    * is correspondingly bounded: a replay arriving within the watermark
    * delay of the first copy is dropped; a replay arriving after that
    * state was evicted is emitted again (at-least-once, not exactly-once).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ev_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Chained stateful pipeline: the watermarked dedup feeding the tumbling
    * aggregation in ONE streaming query — two state stores (dedup keys and
    * window state) under a single watermark, the multi-stateful-operator
    * shape. Append-mode only: the dedup cannot run under complete, so
    * windows emit once the watermark passes their end. Both stores stay
    * watermark-bounded exactly as in the standalone operators.
    */
  def dedupThenTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ev_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ev_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"),
        col("total"))

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks in the preceding hour. Both sides watermarked so the join state
    * is evictable — the streaming analogue of the as-of/interval join.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ev_ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ev_ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** LEFT OUTER stream-stream interval join — [[purchaseAttribution]] with
    * unmatched purchases kept. Distinct state machine from the inner join:
    * a purchase with no click can only be emitted (with NULL click columns)
    * once the watermark proves no matching click can still arrive, so
    * null-side rows trail the data by the watermark delay. Both sides'
    * state stays evictable.
    */
  def purchaseAttributionOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ev_ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ev_ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** Stream-static enrichment: events joined to a static dimension (e.g.
    * the customer table). Stateless — the static side is re-planned per
    * micro-batch and broadcast (the streaming twin of q04's broadcast dim
    * join), so no watermark and no state store are involved; at scale the
    * dimension refreshes by re-reading its source per batch.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("dim_key"), "left")
      .select(events("event_id"), events("user_id"), events("event_type"),
        events("value"), dim("dim_label"))

  final case class Ev(event_id: Long, ev_ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Int, total_value: Double)

  final case class UserHwm(user_id: Long, max_value: Double, n_events: Long)

  /** Per-user high-watermark tracking through `transformWithState` — the
    * arbitrary-state API succeeding mapGroupsWithState (Spark 4): a typed
    * `ValueState` carries (running max, running count) ACROSS micro-batches
    * and each batch emits the key's updated running state. Both components
    * are monotone, so the drained relation's per-key max equals the final
    * state regardless of micro-batch arrival order — what makes a finite
    * multi-batch replay oracle-checkable. TimeMode.None keeps state for the
    * query's lifetime; a production deployment bounds it with a TTLConfig
    * duration (the eviction lever at 100 TB key cardinality).
    */
  final class HwmProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, UserHwm] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Double, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Double, Long)]("hwm",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserHwm] = {
      var (mx, cnt) =
        if (st.exists()) st.get() else (Double.NegativeInfinity, 0L)
      rows.foreach { r => mx = math.max(mx, r.value); cnt += 1 }
      st.update((mx, cnt))
      Iterator.single(UserHwm(key, mx, cnt))
    }
  }

  def highWatermark(events: Dataset[Ev]): Dataset[UserHwm] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new HwmProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class LastEv(user_id: Long, n_seen: Long, pos: Int,
                          event_id: Long, ms: Long, value: Double)

  /** Per-user LAST-N tracking through `transformWithState` with a typed
    * `ListState` — the list-valued state primitive (s08's HwmProcessor
    * covers ValueState): the state holds the user's N most-recent events
    * by (event-time, event_id), each batch MERGES its rows into the stored
    * list and re-ranks (arrival order is deliberately not time order in
    * the s12 replay, so a batch can displace entries persisted by an
    * earlier one — the cross-batch list is load-bearing, not an append
    * log). A monotone `n_seen` counter (ValueState) rides along so a
    * finite multi-batch replay can select each key's FINAL emission from
    * the drained append-mode relation without any ordering assumption.
    * This is the recommendation-feed / feature-store "recent activity"
    * state shape.
    */
  final class LastNProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, LastEv] {
    @transient private var lst:
      org.apache.spark.sql.streaming.ListState[(Long, Long, Double)] = _
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      lst = getHandle.getListState[(Long, Long, Double)]("lastn",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[LastEv] = {
      val incoming = rows
        .map(r => (r.ev_ts.getTime, r.event_id, r.value)).toArray
      val cnt = (if (seen.exists()) seen.get() else 0L) + incoming.length
      val merged = (lst.get().toArray ++ incoming)
        .sortBy(t => (-t._1, -t._2)).take(n)
      lst.clear()
      lst.put(merged)
      seen.update(cnt)
      merged.iterator.zipWithIndex.map { case ((ms, id, v), i) =>
        LastEv(key, cnt, i + 1, id, ms, v)
      }
    }
  }

  def lastN(events: Dataset[Ev], n: Int = 3): Dataset[LastEv] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new LastNProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class TypeCount(user_id: Long, n_seen: Long, event_type: String,
                             cnt: Long, total: Double)

  /** Per-user per-event-type running (count, value total) through
    * `transformWithState` with a typed `MapState` — the map-valued state
    * primitive completing the arbitrary-state quartet (s08: ValueState,
    * s12: ListState, s13: timers): the state is a keyed sub-map PER
    * stream key, each batch MERGES its per-type partials into the stored
    * entries (point lookups + point updates — never a full rewrite of the
    * user's map, which is what distinguishes MapState from a ValueState
    * holding a Map). The monotone `n_seen` ValueState rides along so a
    * finite replay selects each user's FINAL emission (s12's device).
    * This is the feature-store "running per-category counters" shape.
    */
  final class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, TypeCount] {
    // The stored total is INTEGER CENTS (value is an exact 2dp decimal),
    // not a running double: a double accumulated in micro-batch arrival
    // order is order-dependent, which is the q76/q78 knife-edge class —
    // integer merges are associative, so the final total is bit-exact
    // regardless of how the replay was batched (ADVICE r10).
    @transient private var mp:
      org.apache.spark.sql.streaming.MapState[String, (Long, Long)] = _
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      mp = getHandle.getMapState[String, (Long, Long)]("bytype",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeCount] = {
      val incoming = rows.toArray
      val cnt = (if (seen.exists()) seen.get() else 0L) + incoming.length
      // Deterministic type order within the batch (map-iteration noise
      // must not reach the stored doubles); per-type partials land via
      // point lookup + point update.
      incoming.groupBy(_.event_type).toSeq.sortBy(_._1).foreach {
        case (t, evs) =>
          val (c0, s0) =
            if (mp.containsKey(t)) mp.getValue(t) else (0L, 0L)
          mp.updateValue(t, (c0 + evs.length,
            s0 + evs.map(e => math.round(e.value * 100)).sum))
      }
      seen.update(cnt)
      mp.iterator().map { case (t, (c, cents)) =>
        TypeCount(key, cnt, t, c, cents / 100.0)
      }
    }
  }

  def typeCounts(events: Dataset[Ev]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class Timeout(user_id: Long, last_ms: Long, n_events: Long)

  /** Per-user INACTIVITY TIMEOUT through transformWithState EVENT-TIME
    * TIMERS — the third leg of the arbitrary-state API beside s08's
    * ValueState and s12's ListState: each batch updates the user's
    * (last event time, running count) ValueState, cancels the previously
    * registered timer, and re-registers one at last + `gapMs`; when the
    * WATERMARK passes a live timer, [[handleExpiredTimer]] fires exactly
    * once and emits the timeout record (the churn-alert / session-expiry
    * push shape that polling cannot express). State and timer are both
    * per-key in the state store; eviction is the watermark contract
    * itself.
    */
  final class TimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, Timeout] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("last",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Timeout] = {
      val (prevMs, prevN) = if (st.exists()) st.get() else (Long.MinValue, 0L)
      var mx = prevMs
      var n = prevN
      rows.foreach { r => mx = math.max(mx, r.ev_ts.getTime); n += 1 }
      if (prevMs != Long.MinValue) getHandle.deleteTimer(prevMs + gapMs)
      getHandle.registerTimer(mx + gapMs)
      st.update((mx, n))
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Timeout] = {
      val (mx, n) = st.get()
      // Standard session-expiry pattern: clear the key's state once its
      // timeout fires, so a user who comes back in a LATER batch starts a
      // fresh session instead of re-registering a timer over stale counts
      // and firing a second timeout for the old one (ADVICE r9).
      st.clear()
      Iterator.single(Timeout(key, mx, n))
    }
  }

  def inactivityTimeouts(events: Dataset[Ev],
                         gapMs: Long = 30 * 60 * 1000L): Dataset[Timeout] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TimeoutProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives within `gapMs` event-time of the previous one.
    * Custom per-key state — the streaming analogue of the reference's
    * per-vertex mutable state loop.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ev_ts.getTime, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ev_ts.getTime
            cur match {
              case Some(s) if t - s.end <= gapMs =>
                cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case Some(s) =>
                closed += Session(userId, s.start, s.end, s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
