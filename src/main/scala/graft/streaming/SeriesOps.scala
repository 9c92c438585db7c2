package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming variants of the batch time-series queries (q_anomaly /
 * q_gapfill) — the daily-cadence monitoring jobs a pipeline runs
 * continuously instead of re-scanning history each midnight. Both use
 * the r7 out-of-order machinery: per-key `flatMapGroupsWithState`
 * buffers PARTIAL DAY AGGREGATES (never raw events) until the event-
 * time watermark passes a day's end, then folds matured days in day
 * order — so arbitrary disorder inside the watermark delay cannot
 * change a result, and the stream equals the batch query on the same
 * data (spec-pinned, like asof/funnel/dedup).
 *
 * State per key is O(delay-window days) pending counters plus O(1)
 * fold state (a 7-day trailing deque / a last-fill register) — never
 * an event buffer; event-time timeouts release a matured day even
 * when its key receives no further traffic.
 */
object SeriesOps {

  val DayMicros: Long = 86400000000L

  /** Half-up 6-decimal rounding, matching `round(x, 6)` in both
    * engines. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // ---- anomaly: trailing-window z-scores over daily volumes ----

  final case class SeriesEvent(event_type: String, tsMicros: Long)
  private[streaming] final case class SeriesEventWm(event_type: String,
    tsMicros: Long, eventTime: java.sql.Timestamp)
  final case class TrailDay(day: Long, n: Long)
  final case class AnomalyState(pending: Map[Long, Long],
    trail: List[TrailDay])
  final case class AnomalyOut(day: LocalDate, event_type: String,
    n: Long, z: Double)

  /**
   * Streaming q_anomaly: each (event_type, day) volume z-scored
   * against its own trailing 7 OBSERVED days (prior day-rows, the
   * batch `ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING` window), emitted
   * once the watermark passes the day's end. Days without a full
   * 7-day baseline or with zero variance are folded into the trail
   * but not emitted — exactly the batch filter. Append mode.
   */
  def streamingAnomaly(events: Dataset[SeriesEvent],
      delay: String): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    val wm = events
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", delay)
      .as[SeriesEventWm]
    wm.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, AnomalyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k, it, state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(Map.empty, Nil))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val pending = it.foldLeft(st.pending) { (m, e) =>
            val d = e.tsMicros / DayMicros
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          val (ready, hold) =
            pending.partition { case (d, _) => (d + 1) * DayMicros <= wmMicros }
          var trail = st.trail // ascending, at most 7 entries
          val out = Seq.newBuilder[AnomalyOut]
          ready.toSeq.sortBy(_._1).foreach { case (d, n) =>
            if (trail.length == 7) {
              val mu = trail.map(_.n).sum / 7.0
              val sd = math.sqrt(
                trail.map(t => (t.n - mu) * (t.n - mu)).sum / 6.0)
              if (sd > 0)
                out += AnomalyOut(LocalDate.ofEpochDay(d), k, n,
                  round6((n - mu) / sd))
            }
            trail = (trail :+ TrailDay(d, n)).takeRight(7)
          }
          state.update(AnomalyState(hold, trail))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              hold.keys.map(d => (d + 1) * (DayMicros / 1000L)).min))
          out.result().iterator
      }
  }

  // ---- gapfill: densified daily series with forward fill ----

  final case class GapfillEvent(user_id: Long, tsMicros: Long,
    value: Double)
  private[streaming] final case class GapfillEventWm(user_id: Long,
    tsMicros: Long, value: Double, eventTime: java.sql.Timestamp)
  final case class GapfillState(pendingN: Map[Long, Long],
    pendingSum: Map[Long, Double], lastDay: Long, lastFill: Double,
    started: Boolean)
  final case class GapfillOut(user_id: Long, day: LocalDate, n: Long,
    filled_avg: Double)

  /**
   * Streaming q_gapfill: per-user daily (n, avg) rows densified over
   * the user's active span — when a matured day d arrives after a gap,
   * the missing calendar days emit n = 0 with the last observed daily
   * average carried forward (the batch `last(ignoreNulls)` window).
   * Day averages are rounded to 6 decimals at maturity, like the
   * batch `round(avg(value), 6)`, so the carried value is identical.
   * Append mode; the span is [first matured day, newest matured day]
   * per user — the same frontier the batch query reaches once all
   * events are in.
   */
  def streamingGapfill(events: Dataset[GapfillEvent],
      delay: String): Dataset[GapfillOut] = {
    import events.sparkSession.implicits._
    val wm = events
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", delay)
      .as[GapfillEventWm]
    wm.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapfillState, GapfillOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, it, state: GroupState[GapfillState]) =>
          val st = state.getOption.getOrElse(
            GapfillState(Map.empty, Map.empty, 0L, 0.0, started = false))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          var (pn, ps) = (st.pendingN, st.pendingSum)
          it.foreach { e =>
            val d = e.tsMicros / DayMicros
            pn = pn.updated(d, pn.getOrElse(d, 0L) + 1L)
            ps = ps.updated(d, ps.getOrElse(d, 0.0) + e.value)
          }
          val (ready, hold) =
            pn.keySet.partition(d => (d + 1) * DayMicros <= wmMicros)
          var (lastDay, lastFill, started) =
            (st.lastDay, st.lastFill, st.started)
          val out = Seq.newBuilder[GapfillOut]
          ready.toSeq.sorted.foreach { d =>
            val avg = round6(ps(d) / pn(d))
            if (started)
              ((lastDay + 1) until d).foreach(g =>
                out += GapfillOut(uid, LocalDate.ofEpochDay(g), 0L, lastFill))
            out += GapfillOut(uid, LocalDate.ofEpochDay(d), pn(d), avg)
            lastDay = d; lastFill = avg; started = true
          }
          state.update(GapfillState(pn -- ready, ps -- ready, lastDay,
            lastFill, started))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              hold.map(d => (d + 1) * (DayMicros / 1000L)).min))
          out.result().iterator
      }
  }

  // ---- ewma: exponentially-decayed per-key metric ----

  /** Decay factor (¼ — exactly representable, so both engines fold
    * identical IEEE products in identical order). */
  val EwmaAlpha: Double = 0.25

  final case class EwmaEvent(user_id: Long, event_id: Long,
    tsMicros: Long, value: Double)
  final case class EwmaState(ewma: Double, n: Long, lastKey: (Long, Long),
    started: Boolean)
  final case class EwmaOut(user_id: Long, n: Long, ewma: Double)

  /**
   * Streaming EWMA per user — the time-decayed health metric a
   * monitoring job keeps warm (decayed error rate, decayed latency):
   * state is ONE (ewma, n) register per key, each event folds
   * α·x + (1−α)·acc in (ts, event_id) order, emitting the running
   * value every batch (Update mode). In-order input contract (ties
   * broken by event_id), enforced fail-loud — cross-batch disorder
   * callers use the watermark-buffered pattern above. The batch
   * equivalent is [[graft.StreamingQueries.ewma]]'s ordered fold;
   * stream == batch on in-order input is spec-pinned.
   */
  def streamingEwma(events: Dataset[EwmaEvent]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaOut](
        GroupStateTimeout.NoTimeout()) {
        (k, it, state: GroupState[EwmaState]) =>
          var cur = state.getOption
            .getOrElse(EwmaState(0.0, 0L, (Long.MinValue, Long.MinValue),
              started = false))
          it.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
            val key = (e.tsMicros, e.event_id)
            require(!cur.started ||
              Ordering[(Long, Long)].lt(cur.lastKey, key),
              s"out-of-order event for user $k: $key after ${cur.lastKey}")
            cur =
              if (!cur.started) EwmaState(e.value, 1L, key, started = true)
              else EwmaState(EwmaAlpha * e.value + (1 - EwmaAlpha) * cur.ewma,
                cur.n + 1, key, started = true)
          }
          state.update(cur)
          EwmaOut(k, cur.n, round6(cur.ewma))
      }
  }
}
