package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{Hist2D, InfoTheory}

/**
 * Structured-Streaming surface (the reference is batch-only — this is
 * the additive streaming extension from SURVEY §2.10/§7.8).
 *
 * Everything here is written against the unified Dataset API so the SAME
 * transformations run on a batch DataFrame and on `readStream` input:
 * - [[eventFeatures]] / [[windowedStats]]: stateless projections and
 *   watermark-friendly windowed aggregations;
 * - [[Sessionize]]: per-user sessionization — one shared gap-split core,
 *   exposed both as a batch `flatMapGroups` and as a streaming
 *   `flatMapGroupsWithState` whose per-user state is O(open session)
 *   (closed sessions fold into two counters) with a processing-time
 *   timeout that closes idle users and drops their state;
 * - [[IncrementalHistogramState]]: `foreachBatch`-driven incremental
 *   refit of the info-theoretic selector — per micro-batch contingency
 *   deltas are merged into running per-feature tables; because counts
 *   are additive, incremental state after N batches equals the batch
 *   computation over the union (the specs check exactly that).
 */
object StreamingOps {

  /** Byte-domain event features (shared with the DuckDB oracle):
    * f0 = min(floor(value), 255), f1 = user_id % 50, f2 = hour(ts),
    * f3 = day-of-month(ts); label = event_type index (alphabetical). */
  def eventFeatures(events: DataFrame): DataFrame =
    events.select(
      least(floor(col("value")).cast("int"), lit(255)).as("f0"),
      (col("user_id") % 50).cast("int").as("f1"),
      hour(col("ts")).as("f2"),
      dayofmonth(col("ts")).as("f3"),
      (when(col("event_type") === "click", 0)
        .when(col("event_type") === "error", 1)
        .when(col("event_type") === "purchase", 2)
        .when(col("event_type") === "signup", 3)
        .otherwise(4)).as("label"))

  /** Tumbling-window statistics per event type. On a streaming input,
    * pair with `withWatermark("ts", ...)` upstream; the aggregation is
    * identical for batch. Groups by the FULL window struct (projecting
    * `start` only afterwards) — grouping by a field of the window would
    * sever the watermark linkage and make streaming append mode
    * impossible. */
  def windowedStats(events: DataFrame, windowLength: String): DataFrame =
    events.groupBy(window(col("ts"), windowLength).as("win"),
        col("event_type"))
      .agg(count("*").as("cnt"), round(sum("value"), 6).as("sum_value"))
      .select(col("win.start").as("w"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Watermarked streaming variant (event-time, late data dropped after
    * `delay`). */
  def streamingWindowedStats(events: DataFrame, windowLength: String,
      delay: String): DataFrame =
    windowedStats(events.withWatermark("ts", delay), windowLength)

  /** Hopping (sliding) window counts per event type: every event lands
    * in windowLength/slide overlapping windows — Spark expands the
    * assignment per row (no self-join against a window table) and the
    * aggregate partial-combines map-side like any groupBy. Same
    * unified-API contract as [[windowedStats]]: add a watermark
    * upstream and the identical call streams in append mode. */
  def slidingWindowStats(events: DataFrame, windowLength: String,
      slide: String): DataFrame =
    events.groupBy(window(col("ts"), windowLength, slide).as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("w"), col("event_type"), col("cnt"))

  /** Click-to-purchase attribution join: every (purchase, click) pair by
    * the same user where the click lands inside the `window` before the
    * purchase (strictly earlier — a click AT the purchase timestamp is
    * not a cause). Written against the unified API: on batch frames it
    * plans as an equi-join on user_id with a pushed range filter
    * (SortMergeJoin — both sides shuffle once on user_id, never a
    * nested loop); on two `readStream` inputs the SAME call is Spark's
    * canonical watermarked stream-stream interval join, the time bound
    * letting the state store evict rows older than the window + the
    * inputs' watermark delay. Columns are disambiguated BEFORE the join
    * so the caller never touches ambiguous `ts` references. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      window: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(c, col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window")
        && col("c_ts") < col("p_ts"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  /** Streaming attribution: watermark both sides, then the shared
    * interval join. State per user is bounded by window + delay. */
  def streamingAttribution(clicks: DataFrame, purchases: DataFrame,
      window: String = "2 hours", delay: String = "30 minutes"): DataFrame =
    attributionJoin(
      clicks.withWatermark("ts", delay),
      purchases.withWatermark("ts", delay), window)

  /**
   * As-of join (pandas `merge_asof` / kdb `aj`): for every right-side
   * row, the LAST left-side row with a strictly earlier timestamp on
   * the same key — WITHOUT a join. Both sides are tagged and unioned,
   * then ONE key-partitioned, time-ordered window scan carries the
   * latest left id/ts forward (`last(..., ignoreNulls)` over unbounded
   * preceding). Strictness and ties are deterministic by the sort key
   * (ts, tag, leftId): at equal timestamps the right row sorts BEFORE
   * left rows (a left row AT the right row's timestamp never matches),
   * and equal-timestamp left rows resolve to the max id. Unmatched
   * right rows survive with NULLs (left-outer semantics).
   *
   * Scale: one shuffle on the key + a sort — the canonical
   * sorted-merge as-of. A join formulation either range-explodes
   * (every earlier left row per right row) or needs a range-join
   * operator Spark lacks; this shape is linear in rows and skew-bound
   * only by true key skew.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, leftId: String, rightId: String): DataFrame = {
    // null placeholders take each side's ACTUAL id type (string/int ids
    // would otherwise hit union coercion surprises against a hardcoded
    // long), same as lts already does
    val l = left.select(col(key).as("k"), col(ts).as("t"),
      lit(1).as("tag"),
      col(leftId).as("lid"), col(ts).as("lts"),
      lit(null).cast(right.schema(rightId).dataType).as("rid"))
    val r = right.select(col(key).as("k"), col(ts).as("t"),
      lit(0).as("tag"),
      lit(null).cast(left.schema(leftId).dataType).as("lid"),
      lit(null).cast(l.schema("lts").dataType).as("lts"),
      col(rightId).as("rid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("t"), col("tag"), col("lid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_lid", last(col("lid"), ignoreNulls = true).over(w))
      .withColumn("asof_lts", last(col("lts"), ignoreNulls = true).over(w))
      .filter(col("rid").isNotNull)
      .select(col("rid").as(rightId), col("k").as(key),
        col("asof_lid").as(leftId),
        (unix_micros(col("t")) - unix_micros(col("asof_lts"))).as("lag_us"))
  }

  final case class Event(user_id: Long, tsMicros: Long, value: Double)
  final case class SessionSummary(user_id: Long, n_sessions: Long,
      max_session_len: Long)

  /** Tagged input row for [[streamingAsof]]: tag 1 = left (the
    * reference stream whose latest row enriches), 0 = right (the
    * stream being enriched). */
  final case class AsofInput(k: Long, tsMicros: Long, tag: Int, id: Long)
  final case class AsofOut(rid: Long, k: Long, lid: Option[Long],
      lag_us: Option[Long])

  /**
   * Streaming as-of join — the streaming face of [[asofJoin]] (the
   * "latest quote for each trade" enrichment): per key, every right
   * event emits the LAST strictly-earlier left event (or NULLs).
   * State per key is ONE (ts, id) pair — not a buffer — so memory
   * tracks live keys, with the usual idle-timeout eviction. Semantics
   * match the batch operator exactly on a per-key time-ordered stream
   * (the [[Funnel.streaming]] in-order contract): within a micro-batch
   * events sort by (ts, tag, id), so a left row AT a right row's
   * timestamp is invisible to it and equal-timestamp left rows resolve
   * to the max id — the batch sort key verbatim.
   */
  def streamingAsof(events: Dataset[AsofInput],
      idleTimeoutMs: Long = 0L): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.k)
      .flatMapGroupsWithState[(Long, Long), AsofOut](
        OutputMode.Append(), timeoutConf) {
        (k, it, state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption // (left ts, left id)
            val out = Seq.newBuilder[AsofOut]
            it.toSeq.sortBy(e => (e.tsMicros, e.tag, e.id)).foreach { e =>
              if (e.tag == 1) last = Some((e.tsMicros, e.id))
              else out += AsofOut(e.id, k, last.map(_._2),
                last.map(l => e.tsMicros - l._1))
            }
            last.foreach { l =>
              state.update(l)
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            }
            out.result().iterator
          }
      }
  }

  /** State for [[streamingAsofOutOfOrder]]: the folded latest-left
    * (ts, id) over MATURED events, plus the events still inside the
    * watermark delay. */
  final case class AsofBufState(lastTs: Option[Long], lastId: Option[Long],
      pending: Seq[AsofInput])

  /** [[AsofInput]] plus the watermark column — the eventTime attribute
    * must survive into the stateful operator or the analyzer prunes
    * the watermark node and rejects the event-time timeout. */
  private[streaming] final case class AsofInputWm(k: Long, tsMicros: Long,
      tag: Int, id: Long, eventTime: java.sql.Timestamp)

  /**
   * Out-of-order tolerant [[streamingAsof]]: events are held in an
   * event-time buffer until the WATERMARK passes them, then folded in
   * timestamp order — so ANY arrival disorder within `delay` (across
   * micro-batches included) produces exactly the batch [[asofJoin]]
   * answer, where the plain [[streamingAsof]] pins equivalence only
   * under per-key in-order delivery. The price is the standard
   * watermark trade: results for a right event emit only once the
   * watermark passes its timestamp (one `delay` of latency), and state
   * carries up to `delay`'s worth of a key's events instead of O(1).
   * Buffered keys register an event-time timeout at their oldest
   * pending timestamp, so maturation never depends on more events
   * arriving for the key.
   */
  def streamingAsofOutOfOrder(events: Dataset[AsofInput],
      delay: String): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val wm = events
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", delay)
      .as[AsofInputWm]
    wm.groupByKey(_.k)
      .flatMapGroupsWithState[AsofBufState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k, it, state: GroupState[AsofBufState]) =>
          // timeout firings and data batches share one path: release
          // everything the watermark has passed, hold the rest
          val st = state.getOption.getOrElse(AsofBufState(None, None, Nil))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val incoming = it.map(e => AsofInput(e.k, e.tsMicros, e.tag, e.id))
          val (ready, hold) = (st.pending ++ incoming.toSeq)
            .partition(_.tsMicros <= wmMicros)
          var last = st.lastTs.zip(st.lastId)
          val out = Seq.newBuilder[AsofOut]
          ready.sortBy(e => (e.tsMicros, e.tag, e.id)).foreach { e =>
            if (e.tag == 1) last = Some((e.tsMicros, e.id))
            else out += AsofOut(e.id, k, last.map(_._2),
              last.map(l => e.tsMicros - l._1))
          }
          state.update(AsofBufState(last.map(_._1), last.map(_._2), hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              hold.map(_.tsMicros).min / 1000L))
          out.result().iterator
      }
  }

  final case class FunnelEventRow(user_id: Long, tsMicros: Long,
      event_type: String)

  /** Cumulative funnel progress for one user: event-time micros of each
    * COMPLETED stage, in stage order (a strict prefix of the stage
    * list — stage k+1 can only complete after stage k). */
  final case class FunnelProgress(user_id: Long, stage_times: Seq[Long])

  /**
   * Ordered-sequence conversion funnel, one semantics two executions:
   *
   * - [[funnelBatch]]: stage k's completion time is the MIN event time
   *   of a stage-k event inside the window after stage k-1's completion
   *   — N stacked conditional-MIN windows sharing ONE user_id hash
   *   partitioning, then one per-user aggregate (a join formulation
   *   would multiply the events table by the funnel depth).
   * - [[streamingFunnel]]: the same definition folded incrementally per
   *   user in `flatMapGroupsWithState`. State per user is O(depth)
   *   longs — never an event buffer — and on a per-user time-ordered
   *   stream the fold's "first qualifying event" IS the batch "min
   *   qualifying event" (the equivalence the spec pins, the same
   *   in-order contract as [[Sessionize.streaming]] / [[streamingDedup]];
   *   events within one micro-batch are time-sorted before folding, so
   *   only cross-batch disorder breaks it). An idle timeout evicts
   *   users, bounding state by ACTIVE users.
   */
  object Funnel {

    val WindowMicros: Long = 86400000000L // 24 hours
    val Stages: Seq[String] = Seq("view", "click", "purchase")

    /** Fold one event into a user's completed-stage times. */
    def fold(times: List[Long], stages: Seq[String], windowMicros: Long,
        tsMicros: Long, eventType: String): List[Long] = {
      val k = times.length
      if (k < stages.length && eventType == stages(k) &&
        (k == 0 ||
          (tsMicros >= times.last && tsMicros <= times.last + windowMicros)))
        times :+ tsMicros
      else times
    }

    /** Batch funnel over (user_id, ts: timestamp, event_type): one row
      * per user with nullable timestamp columns t0..t{n-1}. */
    def batch(events: DataFrame, stages: Seq[String] = Stages,
        window: String = "24 hours"): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val iv = expr(s"INTERVAL $window")
      var df = events
      stages.zipWithIndex.foreach { case (s, i) =>
        val cond =
          if (i == 0) col("event_type") === s
          else col("event_type") === s &&
            col("ts") >= col(s"t${i - 1}") &&
            col("ts") <= col(s"t${i - 1}") + iv
        df = df.withColumn(s"t$i", min(when(cond, col("ts"))).over(w))
      }
      df.groupBy("user_id")
        .agg(max(col("t0")).as("t0"),
          stages.indices.drop(1).map(i => max(col(s"t$i")).as(s"t$i")): _*)
    }

    /** Streaming funnel (Update mode): emits a user's cumulative
      * [[FunnelProgress]] whenever one of their micro-batches advances
      * or re-reports it; the LAST update per user is the final answer.
      * `idleTimeoutMs <= 0` disables eviction (bounded test runs). */
    def streaming(events: Dataset[FunnelEventRow],
        stages: Seq[String] = Stages,
        windowMicros: Long = WindowMicros,
        idleTimeoutMs: Long = 0L): Dataset[FunnelProgress] = {
      import events.sparkSession.implicits._
      val timeoutConf =
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[List[Long], FunnelProgress](
          OutputMode.Update(), timeoutConf) {
          (uid, it, state: GroupState[List[Long]]) =>
            if (state.hasTimedOut) {
              // every update already emitted the cumulative snapshot;
              // eviction only drops the state
              state.remove()
              Iterator.empty
            } else {
              var times = state.getOption.getOrElse(Nil)
              // micro-batch iterators are partition-ordered, not
              // time-ordered — sort within the batch before folding
              it.toSeq.sortBy(_.tsMicros).foreach { e =>
                times = fold(times, stages, windowMicros,
                  e.tsMicros, e.event_type)
              }
              state.update(times)
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
              Iterator.single(FunnelProgress(uid, times))
            }
        }
    }

    /** State for [[streamingOutOfOrder]]: folded stage times over
      * matured events + the events still inside the watermark delay. */
    final case class FunnelBufState(times: List[Long],
        pending: Seq[FunnelEventRow])

    /** [[FunnelEventRow]] plus the watermark column (see
      * [[StreamingOps.AsofInputWm]]). */
    private[streaming] final case class FunnelEventWm(user_id: Long,
        tsMicros: Long, event_type: String,
        eventTime: java.sql.Timestamp)

    /** Out-of-order tolerant [[streaming]]: the same event-time buffer
      * as [[StreamingOps.streamingAsofOutOfOrder]] — hold events until
      * the watermark passes them, fold in timestamp order — so arrival
      * disorder within `delay` (cross-batch included) converges to the
      * batch funnel, not just in-order feeds. Update mode: each batch
      * that matures events re-emits the user's cumulative progress. */
    def streamingOutOfOrder(events: Dataset[FunnelEventRow], delay: String,
        stages: Seq[String] = Stages,
        windowMicros: Long = WindowMicros): Dataset[FunnelProgress] = {
      import events.sparkSession.implicits._
      val wm = events
        .withColumn("eventTime", timestamp_micros(col("tsMicros")))
        .withWatermark("eventTime", delay)
        .as[FunnelEventWm]
      wm.groupByKey(_.user_id)
        .flatMapGroupsWithState[FunnelBufState, FunnelProgress](
          OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
          (uid, it, state: GroupState[FunnelBufState]) =>
            val st = state.getOption.getOrElse(FunnelBufState(Nil, Nil))
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val incoming = it.map(e =>
              FunnelEventRow(e.user_id, e.tsMicros, e.event_type))
            val (ready, hold) = (st.pending ++ incoming.toSeq)
              .partition(_.tsMicros <= wmMicros)
            var times = st.times
            ready.sortBy(_.tsMicros).foreach { e =>
              times = fold(times, stages, windowMicros,
                e.tsMicros, e.event_type)
            }
            state.update(FunnelBufState(times, hold))
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                hold.map(_.tsMicros).min / 1000L))
            Iterator.single(FunnelProgress(uid, times))
        }
    }
  }

  /** Per-user sessionization with a fixed inactivity gap. */
  object Sessionize {

    val GapMicros: Long = 1800L * 1000000L // 30 minutes

    /** Shared core: session lengths of a user's time-sorted events. */
    def sessionLengths(ts: Seq[Long], gap: Long = GapMicros): Seq[Long] = {
      if (ts.isEmpty) return Nil
      val sorted = ts.sorted
      val out = mutable.ArrayBuffer.empty[Long]
      var len = 1L
      var i = 1
      while (i < sorted.length) {
        if (sorted(i) - sorted(i - 1) > gap) { out += len; len = 1L }
        else len += 1
        i += 1
      }
      out += len
      out.toSeq
    }

    /** Batch path: groupByKey + flatMapGroups over the shared core. */
    def batch(events: Dataset[Event]): Dataset[SessionSummary] = {
      import events.sparkSession.implicits._
      events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
        val lens = sessionLengths(it.map(_.tsMicros).toSeq)
        Iterator.single(SessionSummary(uid, lens.length.toLong, lens.max))
      }
    }

    /**
     * Declarative variant on Spark's built-in `session_window` (works on
     * batch AND streaming frames; on streaming, state merging and
     * watermark eviction are handled by the engine). Input needs
     * (user_id, ts: timestamp). Boundary semantics match
     * [[sessionLengths]]: an event exactly `gap` after the previous one
     * MERGES into the session; only a strictly larger difference splits
     * (verified empirically against Spark 4.1.2 — do not "fix" either
     * side alone, the q_sessionize oracles pin both).
     */
    def native(events: DataFrame, gap: String = "30 minutes"): DataFrame =
      events
        .groupBy(col("user_id"), session_window(col("ts"), gap))
        .agg(count("*").as("len"))
        .groupBy("user_id")
        .agg(count("*").as("n_sessions"), max("len").as("max_session_len"))

    /**
     * Streaming per-user state: closed sessions are FOLDED to
     * (count, max length) — never a growing list — plus the open
     * session's timestamps (bounded by the activity within one gap
     * window). Idle users time out after `idleTimeoutMs` of processing
     * time: their open session closes, a final summary emits, and the
     * state is removed — so state size tracks ACTIVE users, not
     * all-time users.
     */
    final case class UserState(nClosed: Long, maxClosed: Long,
        openTs: List[Long])

    /** Final summary for a user whose open session just closed (idle
      * timeout): the open session, if any, becomes a closed one. */
    def finalizeUser(uid: Long, prev: UserState): SessionSummary = {
      val openLen = prev.openTs.length.toLong
      SessionSummary(uid,
        prev.nClosed + (if (openLen > 0) 1 else 0),
        math.max(prev.maxClosed, openLen))
    }

    val IdleTimeoutMs: Long = 3600 * 1000L // close idle users after 1h

    /** `idleTimeoutMs <= 0` disables the processing-time timeout (state
      * then lives until the query stops — only for bounded test runs;
      * a long-running production stream should always evict). Note that
      * with timeouts enabled Spark schedules continuous empty
      * micro-batches to evaluate them — that is the expected cost of
      * processing-time eviction, not a bug. */
    def streaming(events: Dataset[Event],
        idleTimeoutMs: Long = IdleTimeoutMs): Dataset[SessionSummary] = {
      import events.sparkSession.implicits._
      val timeoutConf =
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[UserState, SessionSummary](
          OutputMode.Update(), timeoutConf) {
          (uid, it, state: GroupState[UserState]) =>
            if (state.hasTimedOut) {
              // no new events: close the open session, emit, drop state
              val out = finalizeUser(uid, state.get)
              state.remove()
              Iterator.single(out)
            } else {
              val prev = state.getOption.getOrElse(UserState(0L, 0L, Nil))
              val all = prev.openTs ++ it.map(_.tsMicros).toSeq
              val lens = sessionLengths(all)
              // keep the last session open (more events may arrive)
              val closedNow = lens.dropRight(1)
              val nClosed = prev.nClosed + closedNow.length
              val maxClosed = (prev.maxClosed +: closedNow).max
              val openLen = lens.lastOption.getOrElse(0L)
              state.update(UserState(nClosed, maxClosed,
                all.sorted.takeRight(openLen.toInt)))
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
              val n = nClosed + (if (openLen > 0) 1 else 0)
              Iterator.single(SessionSummary(uid, n,
                math.max(maxClosed, openLen)))
            }
        }
    }

    /** State for [[streamingOutOfOrder]]: the in-order fold's fields
      * plus the events still inside the watermark delay. */
    final case class SessionBufState(nClosed: Long, maxClosed: Long,
        openTs: List[Long], pending: Seq[Long])

    private[streaming] final case class EventWm(user_id: Long,
        tsMicros: Long, value: Double, eventTime: java.sql.Timestamp)

    /**
     * Out-of-order tolerant [[streaming]] (Update mode, last update
     * per user wins): events are held until the WATERMARK passes them,
     * then folded in timestamp order into the same
     * closed-count/max/open-tail state as the in-order path — so any
     * arrival disorder within `delay` produces exactly the batch
     * [[batch]] summary. Matured events are always >= every
     * previously-folded timestamp (they matured under an older
     * watermark), so the incremental fold's sorted-prefix invariant
     * holds by construction — the same argument as
     * [[StreamingOps.streamingAsofOutOfOrder]].
     */
    def streamingOutOfOrder(events: Dataset[Event],
        delay: String): Dataset[SessionSummary] = {
      import events.sparkSession.implicits._
      val wm = events
        .withColumn("eventTime", timestamp_micros(col("tsMicros")))
        .withWatermark("eventTime", delay)
        .as[EventWm]
      wm.groupByKey(_.user_id)
        .flatMapGroupsWithState[SessionBufState, SessionSummary](
          OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
          (uid, it, state: GroupState[SessionBufState]) =>
            val st = state.getOption
              .getOrElse(SessionBufState(0L, 0L, Nil, Nil))
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val (ready, hold) = (st.pending ++ it.map(_.tsMicros).toSeq)
              .partition(_ <= wmMicros)
            val all = st.openTs ++ ready.sorted
            val lens = sessionLengths(all)
            val closedNow = lens.dropRight(1)
            val nClosed = st.nClosed + closedNow.length
            val maxClosed = (st.maxClosed +: closedNow).max
            val openLen = lens.lastOption.getOrElse(0L)
            state.update(SessionBufState(nClosed, maxClosed,
              all.takeRight(openLen.toInt), hold))
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1, hold.min / 1000L + 1))
            val n = nClosed + (if (openLen > 0) 1 else 0)
            Iterator.single(SessionSummary(uid, n,
              math.max(maxClosed, openLen)))
        }
    }
  }

  /**
   * Streaming first-seen deduplication — the streaming face of
   * [[graft.pipeline.Dedup.exact]]: the first record of each content
   * fingerprint passes, later duplicates are dropped. State holds one
   * key per distinct fingerprint inside the watermark horizon and is
   * evicted beyond it (`dropDuplicatesWithinWatermark`), so state size
   * tracks the dedup window, not the stream's lifetime — the property
   * that makes streaming dedup viable on an unbounded corpus.
   *
   * Streaming keeps the FIRST ARRIVAL; the batch canonical form
   * [[firstSeenBatch]] keeps the first by (event time, id). On an
   * in-order stream the two coincide (the spec pins this equivalence).
   */
  def streamingDedup(df: DataFrame, fp: org.apache.spark.sql.Column,
      tsCol: String, delay: String): DataFrame =
    df.withColumn("fp", fp)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch canonical first-seen dedup: the row with the minimum
    * (tsCol, idCol) per fingerprint — deterministic, so an independent
    * SQL engine reproduces it exactly. */
  def firstSeenBatch(df: DataFrame, fp: org.apache.spark.sql.Column,
      tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col(tsCol), col(idCol))
    df.withColumn("fp", fp)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** Input row for [[streamingDedupOutOfOrder]]. */
  final case class DedupInput(fp: String, tsMicros: Long, id: Long)

  /** The canonical keeper of one fingerprint. */
  final case class DedupKeeper(fp: String, tsMicros: Long, id: Long)

  /** State for [[streamingDedupOutOfOrder]]: the keeper once emitted,
    * plus (ts, id) rows still inside the watermark delay. */
  final case class DedupBufState(keeperTs: Option[Long],
      keeperId: Option[Long], pending: Seq[(Long, Long)])

  private[streaming] final case class DedupInputWm(fp: String,
      tsMicros: Long, id: Long, eventTime: java.sql.Timestamp)

  /**
   * Out-of-order tolerant first-seen dedup: where [[streamingDedup]]
   * keeps the first ARRIVAL of a fingerprint (== the batch canonical
   * [[firstSeenBatch]] only on in-order streams), this holds rows in
   * an event-time buffer until the WATERMARK passes them and then
   * emits the minimum-(ts, id) row — the batch canonical keeper —
   * regardless of arrival order within `delay`. Same watermark-buffer
   * pattern (and the same latency/state trade) as
   * [[streamingAsofOutOfOrder]].
   *
   * After the keeper is emitted, later duplicates are dropped while
   * the fingerprint's state lives; state is evicted once the watermark
   * passes `keeperTs + horizonMicros`, so — exactly like
   * `dropDuplicatesWithinWatermark` — a duplicate arriving beyond the
   * horizon re-emits, and state size tracks the dedup window, not the
   * stream's lifetime.
   */
  def streamingDedupOutOfOrder(rows: Dataset[DedupInput], delay: String,
      horizonMicros: Long): Dataset[DedupKeeper] = {
    import rows.sparkSession.implicits._
    val wm = rows
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", delay)
      .as[DedupInputWm]
    wm.groupByKey(_.fp)
      .flatMapGroupsWithState[DedupBufState, DedupKeeper](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (fp, it, state: GroupState[DedupBufState]) =>
          val st = state.getOption.getOrElse(DedupBufState(None, None, Nil))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val all = st.pending ++ it.map(e => (e.tsMicros, e.id)).toSeq
          // a row is mature when no future arrival can precede it:
          // late rows are filtered at ts < watermark, so strictly-
          // earlier (and tie-breaking equal-ts) rows can no longer come
          val (ready, hold) = all.partition(_._1 < wmMicros)
          val out = Seq.newBuilder[DedupKeeper]
          var keeper = st.keeperTs.zip(st.keeperId)
          if (keeper.isEmpty && ready.nonEmpty) {
            val k = ready.min
            out += DedupKeeper(fp, k._1, k._2)
            keeper = Some(k)
          }
          // matured non-keepers are duplicates by definition; drop them
          if (hold.isEmpty && keeper.exists(k =>
              k._1 + horizonMicros < wmMicros)) {
            state.remove()
          } else {
            state.update(DedupBufState(keeper.map(_._1), keeper.map(_._2),
              hold))
            val next = (hold.map(_._1) ++
              keeper.map(_._1 + horizonMicros)).min
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, next / 1000L + 1))
          }
          out.result().iterator
      }
  }

  /**
   * Incremental selector refit state: running per-feature 2-D
   * contingency tables (feature value x label), merged from per-batch
   * deltas computed with one `groupBy.count` per micro-batch (Catalyst
   * partial aggregation does the heavy lifting; the delta crossing to
   * the driver is O(nonzero cells) <= 256 x |Y| per feature).
   *
   * Requires non-null feature/label columns in the byte domain (the
   * same contract as the batch selector input).
   */
  final class IncrementalHistogramState(
      val nFeatures: Int, val xCard: Int, val yCard: Int)
      extends Serializable {

    val counts: Array[Array[Long]] =
      Array.fill(nFeatures)(new Array[Long](xCard * yCard))
    var nInstances: Long = 0L

    /** Fold one micro-batch of feature rows (f0..f{n-1}, label).
      *
      * Per-partition primitive-array accumulation (the batch histogram
      * kernel's shape): each task folds its rows into nFeatures dense
      * count matrices and the matrices tree-reduce — no row expansion
      * anywhere. The previous formulation exploded nFeatures structs
      * per row before a groupBy; at the survey's real width (631
      * features) that is a 631x row blowup through the shuffle, where
      * this ships O(partitions x nFeatures x xCard x yCard) longs
      * regardless of batch size or width. */
    def update(batch: DataFrame): this.type = {
      val nf = nFeatures; val xc = xCard; val yc = yCard
      val rdd = batch
        .select((0 until nf).map(i => col(s"f$i")) :+ col("label"): _*)
        .rdd
      if (rdd.getNumPartitions == 0) return this // empty micro-batch
      val (delta, n) = rdd.mapPartitions { it =>
          val acc = Array.fill(nf)(new Array[Long](xc * yc))
          var n = 0L
          it.foreach { r =>
            require(!(0 to nf).exists(r.isNullAt),
              "IncrementalHistogramState: null feature/label value")
            val y = r.getInt(nf)
            var f = 0
            while (f < nf) { acc(f)(r.getInt(f) * yc + y) += 1L; f += 1 }
            n += 1L
          }
          Iterator.single((acc, n))
        }
        .treeReduce({ case ((a, na), (b, nb)) =>
          var f = 0
          while (f < nf) {
            val af = a(f); val bf = b(f)
            var i = 0
            while (i < af.length) { af(i) += bf(i); i += 1 }
            f += 1
          }
          (a, na + nb)
        }, depth = 2)
      var f = 0
      while (f < nf) {
        val cf = counts(f); val df = delta(f)
        var i = 0
        while (i < cf.length) { cf(i) += df(i); i += 1 }
        f += 1
      }
      nInstances += n
      this
    }

    def histogram(f: Int): Hist2D = Hist2D(xCard, yCard, counts(f).clone())

    /** Relevances I(Xf; Y) from the accumulated state. */
    def relevances: Array[(Int, Double)] =
      Array.tabulate(nFeatures)(f =>
        (f, InfoTheory.mutualInfo(histogram(f), nInstances)))

    /** Long-form view of the accumulated state (nonzero cells). */
    def toLongForm: Seq[(Int, Int, Int, Long)] =
      for {
        f <- 0 until nFeatures
        x <- 0 until xCard
        y <- 0 until yCard
        c = counts(f)(x * yCard + y) if c > 0
      } yield (f, x, y, c)
  }
}
