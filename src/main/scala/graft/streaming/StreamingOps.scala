package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
 *   `flatMapGroupsWithState` with processing-time timeout;
 * - [[IncrementalHistogramState]]: `foreachBatch`-driven incremental
 *   refit of the info-theoretic selector — per micro-batch contingency
 *   deltas are merged into running per-feature tables; because counts
 *   are additive, incremental state after N batches equals the batch
 *   computation over the union (the oracle checks exactly that).
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
    * identical for batch. */
  def windowedStats(events: DataFrame, windowLength: String): DataFrame =
    events.groupBy(window(col("ts"), windowLength).getField("start").as("w"),
        col("event_type"))
      .agg(count("*").as("cnt"), round(sum("value"), 6).as("sum_value"))

  /** Watermarked streaming variant (event-time, late data dropped after
    * `delay`). */
  def streamingWindowedStats(events: DataFrame, windowLength: String,
      delay: String): DataFrame =
    windowedStats(events.withWatermark("ts", delay), windowLength)

  final case class Event(user_id: Long, tsMicros: Long, value: Double)
  final case class SessionSummary(user_id: Long, n_sessions: Long,
      max_session_len: Long)

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

    /** Streaming path: flatMapGroupsWithState holding the open session +
      * closed-session summary per user; emits a summary snapshot on
      * every update (OutputMode.Update). */
    final case class UserState(closedLens: List[Long], openTs: List[Long])

    def streaming(events: Dataset[Event]): Dataset[SessionSummary] = {
      import events.sparkSession.implicits._
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[UserState, SessionSummary](
          OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (uid, it, state: GroupState[UserState]) =>
            val prev = state.getOption.getOrElse(UserState(Nil, Nil))
            val all = prev.openTs ++ it.map(_.tsMicros).toSeq
            val lens = sessionLengths(all)
            // keep the last session open (more events may arrive)
            val closed = prev.closedLens ++ lens.dropRight(1)
            val openLen = lens.lastOption.getOrElse(0L)
            state.update(UserState(closed,
              all.sorted.takeRight(openLen.toInt)))
            val summaryLens = closed :+ openLen
            Iterator.single(SessionSummary(uid, summaryLens.length.toLong,
              summaryLens.max))
        }
    }
  }

  /**
   * Incremental selector refit state: running per-feature 2-D
   * contingency tables (feature value x label), merged from per-batch
   * deltas computed with one `groupBy.count` per micro-batch (Catalyst
   * partial aggregation does the heavy lifting; the delta crossing to
   * the driver is O(nonzero cells) <= 256 x |Y| per feature).
   */
  final class IncrementalHistogramState(
      val nFeatures: Int, val xCard: Int, val yCard: Int)
      extends Serializable {

    val counts: Array[Array[Long]] =
      Array.fill(nFeatures)(new Array[Long](xCard * yCard))
    var nInstances: Long = 0L

    /** Fold one micro-batch of feature rows (f0..f{n-1}, label). */
    def update(batch: DataFrame): this.type = {
      val cols = (0 until nFeatures).map(i => col(s"f$i")) :+ col("label")
      // one long-form delta per batch: (feature, x, y, cnt)
      val stacked = batch.select(
        explode(array((0 until nFeatures).map(i =>
          struct(lit(i).as("feature"), col(s"f$i").as("x"))): _*)).as("fx"),
        col("label").as("y"))
        .select(col("fx.feature"), col("fx.x"), col("y"))
        .groupBy("feature", "x", "y").count()
      val rows = stacked.collect()
      var batchN = 0L
      rows.foreach { r =>
        val f = r.getInt(0); val x = r.getInt(1); val y = r.getInt(2)
        val c = r.getLong(3)
        counts(f)(x * yCard + y) += c
        if (f == 0) batchN += c
      }
      nInstances += batchN
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
