package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incrementally-maintained materialized GROUP-BY view over a
 * [[Versioned]] source table — the lakehouse "incremental MV" refresh:
 * `read` always equals `SELECT group, COUNT(*), SUM(cols...) FROM
 * resolved-current GROUP BY group`, but `refresh` pays DELTA cost,
 * never a source re-scan.
 *
 * Mechanics per refresh (source versions (from, to]):
 *  - the delta slice is the raw version dirs in the range (checkpoint
 *    dirs excluded — they duplicate log rows); the NEWEST row per key
 *    inside the slice (tombstones kept) is each touched key's new
 *    state — intermediate states inside one refresh batch never touch
 *    the view, exactly like a collapsed CDC feed;
 *  - old contributions come from the resolved state AS OF `from`,
 *    SEMI-JOINED to the touched keys — the only read of pre-existing
 *    data, pruned to the keys the delta moved (and bounded below by
 *    the newest source checkpoint, like every resolve);
 *  - each touched key contributes (-1, -vals) under its old group and,
 *    unless deleted, (+1, +vals) under its new group — group
 *    MIGRATION (an upsert that changes the group column) moves mass
 *    between groups in one pass;
 *  - per-group delta sums fold into the view's current rows; groups
 *    reaching zero rows commit as tombstones. The view is itself a
 *    Versioned table keyed by the group column, and the refresh
 *    commits through [[Versioned.appendBatch]] with `batchId = to` —
 *    the idempotency marker is atomic with visibility, so a crashed
 *    refresh either never happened or is a no-op on retry
 *    (exactly-once view maintenance, no double-counted deltas).
 *
 * Sums over integral columns are exact (the oracle-gated path); sums
 * over floating columns accumulate in delta order, which can differ
 * from a full recompute in the last ulp — the standard incremental-MV
 * caveat, round on read if bit-stability across engines matters.
 * MERGE (column-overlay) commits in the delta range are rejected
 * loudly: an overlay carries no self-contained row state to diff
 * (same contract as [[Versioned.history]]).
 *
 * Concurrency contract:
 *  - concurrent MAINTAINERS are safe: racing refreshes of the same
 *    range serialize on [[Versioned.appendBatch]]'s atomic batch
 *    claim — exactly one commits, the other adopts its version;
 *  - concurrent SOURCE writers are safe-by-refusal: refresh FAILS
 *    LOUDLY while a source version slot at or below its head is
 *    claimed but unpublished (a slow writer publishing below an
 *    already-folded head would otherwise be filtered by `v > from`
 *    forever — silent, permanent drift). Wait the writer out (or let
 *    `vacuum` sweep a crashed writer's stale claim) and retry;
 *  - source VACUUM below the view's refreshed version fails the next
 *    refresh loudly (the reclaimed deltas are unrecoverable — rebuild
 *    with [[init]]); a vacuumed source is fine as long as the view
 *    keeps pace with retention, and a FRESH view on a vacuumed source
 *    bootstraps from the vacuum-base checkpoint like [[Versioned.asOf]].
 *
 * Group values must be NON-NULL (caller contract — the view's
 * per-group fold joins on the group key; coalesce a nullable group to
 * a sentinel before grouping on it).
 */
object MatView {

  final case class Handle(viewPath: String, srcPath: String,
    keyCol: String, groupCol: String, sumCols: Seq[String],
    minMaxCols: Seq[String] = Nil)

  private val GroupCol = "g"

  /** Broadcast the touched-key semi-join build side only below this
    * ESTIMATED byte size (key payload measured by a delta-sized agg,
    * not a row count — 2M wide string keys are hundreds of MB). */
  private[io] val BroadcastBytes = 64L << 20

  /** Estimated in-memory bytes of a one-column key frame: measured key
    * payload (string rendering) plus per-row object overhead — one
    * delta-sized agg, never a driver collect. */
  private[io] def keyBytes(df: DataFrame, keyCol: String): Long = {
    val st = df.agg(count(lit(1)),
      coalesce(sum(bit_length(col(keyCol).cast("string"))), lit(0L)))
      .head()
    st.getLong(1) / 8 + st.getLong(0) * 16
  }

  /** Create the view (dropping any prior state) and run the first
    * refresh against the source's current head. `sumCols` maintain
    * COUNT/SUM purely from deltas; `minMaxCols` add min_<c>/max_<c>.
    *
    * min/max are not invertible under deletes, so their maintenance is
    * two-tier: an APPEND-ONLY refresh (no tombstones in the delta, no
    * prior state for any touched key) folds the delta's extremes
    * directly into the view's — monotone, delta cost, NO source read;
    * any other refresh falls back to SCOPED RECOMPUTE — min/max of the
    * TOUCHED groups re-derived from the resolved source (the standard
    * incremental-MV treatment of non-distributive aggregates). Honest
    * cost of the fallback: a row's group is only knowable post-resolve,
    * so it pays one source resolve per refresh — bounded below by the
    * newest source checkpoint, so keep the source compacted on a
    * cadence. The COUNT/SUM-only path and the append-only fast path
    * resolve nothing beyond the touched keys' own rows. */
  def init(spark: SparkSession, srcPath: String, keyCol: String,
      groupCol: String, sumCols: Seq[String], viewPath: String,
      minMaxCols: Seq[String] = Nil): Handle = {
    val h = Handle(viewPath, srcPath, keyCol, groupCol, sumCols, minMaxCols)
    Versioned.drop(spark, viewPath)
    refresh(spark, h)
    h
  }

  /** The source version the view reflects (0 = nothing yet): max
    * refresh batch marker across the view's committed versions. */
  def refreshedVersion(spark: SparkSession, h: Handle): Int =
    Versioned.batchMarkerMax(spark, h.viewPath)

  /** Fold source versions (refreshedVersion, head] into the view.
    * Returns the source version the view now reflects. Idempotent:
    * re-running after a crash (or concurrently-already-applied batch)
    * commits nothing twice. */
  def refresh(spark: SparkSession, h: Handle): Int =
    refreshDetailed(spark, h)._1

  /** [[refresh]] plus whether min/max maintenance took the APPEND-ONLY
    * fast path (delta extremes folded directly, no source resolve) —
    * per-call observability for specs and ops dashboards. */
  private[graft] def refreshDetailed(spark: SparkSession,
      h: Handle): (Int, Boolean) = {
    val from = refreshedVersion(spark, h)
    val to = Versioned.latestVersion(spark, h.srcPath)
    if (to <= from) return (from, false)
    val deltaVs = Versioned.viewDeltaSlice(spark, h.srcPath, from, to)
    // a range of pure checkpoints carries no log rows (compaction only)
    if (deltaVs.isEmpty) return (from, false)
    // project to the view-relevant columns up front so parquet column
    // pruning drops everything else — on a wide source table the
    // refresh reads only key + group + aggregated columns, not payloads
    val neededCols = (h.keyCol +: h.groupCol +: (h.sumCols ++ h.minMaxCols))
      .distinct
    def pruned(df: DataFrame) = {
      val keep = neededCols.filter(df.columns.contains) ++
        df.columns.filter(Versioned.MetaCols.contains)
      df.select(keep.map(col): _*)
    }
    val delta = pruned(Versioned.readDirs(spark, h.srcPath, deltaVs))
    // newest state per touched key inside the slice, tombstones kept
    val w = Window.partitionBy(h.keyCol)
      .orderBy(col(Versioned.VersionCol).desc,
        col(Versioned.SeqCol).desc_nulls_last)
    val newest0 = delta.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .localCheckpoint()
    // a delete-only slice carries just the key column (tombstone rows
    // have no values); surface the value columns as nulls so the
    // non-deleted projection resolves — tombstones are filtered before
    // any null reaches an aggregate
    val newest = (h.groupCol +: (h.sumCols ++ h.minMaxCols).distinct)
      .foldLeft(newest0)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
    val touched = newest.select(h.keyCol).distinct().localCheckpoint()
    // the touched-key set is delta-sized and already materialized —
    // when its ESTIMATED BYTES fit a broadcast, pin the semi-join to
    // BroadcastHashJoin so the big (old-state) side STREAMS through the
    // probe instead of shuffling source-sized data on the key. The
    // estimate measures the real key payload (one delta-sized agg over
    // the string rendering + per-row overhead), not a row count — 2M
    // wide string keys would blow past executor memory long before 2M
    // int keys do.
    val touchedSmall = keyBytes(touched, h.keyCol) <= BroadcastBytes
    def semiTouched(df: DataFrame) =
      df.join(if (touchedSmall) broadcast(touched) else touched,
        Seq(h.keyCol), "left_semi")
    // old contributions: resolve at `from` restricted to the touched
    // keys BEFORE the resolve window (per-key resolve commutes with a
    // key filter), so this read shuffles O(touched keys' rows) — never
    // the whole source — and starts from the newest checkpoint <= from
    // like every resolve. Materialized when min/max needs to test it
    // for emptiness (the fold reads it right after anyway).
    val needMm = h.minMaxCols.nonEmpty
    val oldState0 =
      if (from == 0) null
      else {
        val baseCk = Versioned.checkpoints(spark, h.srcPath)
          .filter(_ <= from).lastOption
        val loV = baseCk.map(_ - 1).getOrElse(0)
        val oldVs = Versioned.versions(spark, h.srcPath)
          .filter(v => v > loV && v <= from)
        val hasMerges = Versioned.mergeVersions(spark, h.srcPath)
          .exists(v => v > loV && v <= from)
        Versioned.resolve(
          semiTouched(pruned(Versioned.readDirs(spark, h.srcPath, oldVs))),
          h.keyCol, hasMerges)
      }
    val oldState =
      if (oldState0 != null && needMm) oldState0.localCheckpoint()
      else oldState0
    // min/max APPEND-ONLY fast path: no tombstones in the delta and no
    // prior state for any touched key (pure inserts) — each touched
    // group's extremes can only widen, so fold least/greatest of the
    // delta into the view and skip the source resolve entirely
    val fastMm = needMm &&
      newest0.filter(col(Versioned.DeletedCol)).isEmpty &&
      (oldState == null || oldState.isEmpty)
    def contrib(df: DataFrame, sign: Int) =
      df.select(
        col(h.groupCol).as(GroupCol) +:
          lit(sign.toLong).as("__dn") +:
          h.sumCols.map(c => (col(c) * sign).as(s"__d_$c")): _*)
    val newC = contrib(newest.filter(!col(Versioned.DeletedCol)), 1)
    val contribs =
      if (oldState == null) newC
      else newC.unionByName(contrib(oldState, -1))
    val deltaAgg = contribs.groupBy(GroupCol)
      .agg(sum("__dn").as("__dn"),
        h.sumCols.map(c => sum(s"__d_$c").as(s"__d_$c")): _*)
    // fold into the current view rows (absent group = all zeros)
    val viewCur =
      if (Versioned.latestVersion(spark, h.viewPath) == 0) null
      else Versioned.current(spark, h.viewPath, GroupCol)
        .drop(Versioned.VersionCol)
    val joined =
      if (viewCur == null) deltaAgg
      else deltaAgg.join(viewCur, Seq(GroupCol), "left")
    def base(c: String) =
      if (viewCur == null) lit(0L) else coalesce(col(c), lit(0L))
    val stdCols =
      col(GroupCol) +:
        (base("n_rows") + col("__dn")).as("n_rows") +:
        h.sumCols.map(c =>
          (base(s"sum_$c") + coalesce(col(s"__d_$c"), lit(0L)))
            .as(s"sum_$c")) :+
        (base("n_rows") + col("__dn") === 0).as(Versioned.DeletedCol)
    val withMinMax =
      if (!needMm) joined.select(stdCols: _*)
      else if (fastMm) {
        val mmAggs = h.minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"__dmin_$c"), max(col(c)).as(s"__dmax_$c")))
        val deltaMm = newest.filter(!col(Versioned.DeletedCol))
          .groupBy(col(h.groupCol).as(GroupCol))
          .agg(mmAggs.head, mmAggs.tail: _*)
        // least/greatest skip nulls: a brand-new group (no view row)
        // takes the delta extremes; a view min of null (no non-null
        // values yet) defers to the delta likewise
        def oldMm(c: String) =
          if (viewCur == null) lit(null) else col(c)
        joined.join(deltaMm, Seq(GroupCol), "left")
          .select(stdCols ++ h.minMaxCols.flatMap(c => Seq(
            least(oldMm(s"min_$c"), col(s"__dmin_$c")).as(s"min_$c"),
            greatest(oldMm(s"max_$c"), col(s"__dmax_$c")).as(s"max_$c"))): _*)
      } else {
        // non-invertible fallback: recompute min/max of each TOUCHED
        // group from the resolved source as of `to` (semi-join scoped —
        // untouched groups never read). An emptied group finds no rows
        // and keeps nulls; its view row is a tombstone anyway.
        val newRows = joined.select(stdCols: _*)
        val touchedGroups = deltaAgg.select(col(GroupCol).as(h.groupCol))
        val scoped = Versioned.currentAsOf(spark, h.srcPath, h.keyCol, to)
          .join(touchedGroups, Seq(h.groupCol), "left_semi")
        val aggs = h.minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val mm = scoped.groupBy(col(h.groupCol).as(GroupCol))
          .agg(aggs.head, aggs.tail: _*)
        newRows.join(mm, Seq(GroupCol), "left")
      }
    Versioned.appendBatch(withMinMax, h.viewPath, batchId = to.toLong)
    (to, fastMm)
  }

  /** Bound the VIEW's own history: every refresh adds a view version,
    * so over months a hot view's version listing and resolve fan-in
    * grow without bound. This checkpoint-compacts the view and vacuums
    * versions beyond `horizon` — like any Versioned table — but the
    * checkpoint CARRIES the newest refresh marker forward: a plain
    * compact + vacuum would erase the `_BATCH_` markers with the old
    * versions, [[refreshedVersion]] would report 0, and the next
    * refresh would re-fold already-applied source deltas into the view
    * (silent double-count). Same single-maintainer contract as
    * [[Versioned.vacuum]]; must not race a concurrent [[refresh]]. */
  def maintainView(spark: SparkSession, h: Handle,
      horizon: Int = 0): Seq[Int] = {
    val rv = refreshedVersion(spark, h)
    if (rv == 0) return Nil
    Versioned.compactWithMarker(spark, h.viewPath, GroupCol, s"_BATCH_$rv")
    Versioned.vacuum(spark, h.viewPath, horizon)
  }

  /** The maintained view: (groupCol, n_rows, sum_<c>...) — always equal
    * to the full GROUP BY over the source's resolved current state as
    * of the last refresh. */
  def read(spark: SparkSession, h: Handle): DataFrame =
    Versioned.current(spark, h.viewPath, GroupCol)
      .select(col(GroupCol).as(h.groupCol) +: col("n_rows") +:
        (h.sumCols.map(c => col(s"sum_$c")) ++
          h.minMaxCols.flatMap(c =>
            Seq(col(s"min_$c"), col(s"max_$c")))): _*)
}
