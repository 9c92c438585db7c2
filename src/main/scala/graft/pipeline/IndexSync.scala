package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{GenLog, Versioned}

/**
 * TABLE → INDEX CDC SYNC: keep an at-rest search/vector index fresh
 * against a mutating [[graft.io.Versioned]] table — the loop every
 * serving stack otherwise hand-writes: drain the table's change feed
 * into the index, inserts/updates as re-ingest, deletes as gen-aware
 * tombstones, EXACTLY ONCE per source version.
 *
 * Mechanics (the MatView.refresh contract pointed at a gen-log
 * index):
 *
 *  - the index's generation log carries the sync WATERMARK — the
 *    last folded source version — as a batch marker
 *    (`seg@<ingest>@<version>`, [[GenLog.segKind]]) whose ingest
 *    scope is derived from the TABLE path, so compaction folds it
 *    into the base watermark and replay stays recognized even after
 *    the per-batch marker is vacuumed;
 *  - each sync computes the change set `(watermark, head]` through
 *    [[Versioned.changesAuto]] (O(delta) when the kernel allows,
 *    full diff otherwise — MERGE commits, mapping changes and NULL
 *    keys all classify correctly), tombstones the updated/deleted
 *    keys, then re-ingests the inserted/updated keys' CURRENT rows
 *    read through the bounded point-lookup
 *    [[Versioned.currentForKeys]] (checkpoint-base scan, IN-set file
 *    pruning — per-key file lookups, never a table scan);
 *  - the append commits WITH the head-version marker, which is the
 *    atomic "this version is folded" stamp: a crash between the
 *    tombstone gen and the append replays the whole version —
 *    re-deleting dead ids is a no-op and the append then lands once;
 *    a crash after the append is recognized by the marker and
 *    skipped. Mid-sync readers may observe the between-gens state
 *    (docs deleted but not yet re-ingested) — the same transient any
 *    delete+append reingest cycle has; both gens land within one
 *    sync call.
 *
 * Bootstrap: a sync-managed index starts EMPTY (e.g.
 * `Search.writeIndex(docs.limit(0), …)` / a fresh [[VecIndex.init]])
 * and the first sync ingests the whole current state as the
 * `(0, head]` fold. An index that is non-empty but has NO sync
 * watermark was built out of band — the sync cannot know which rows
 * it holds and REFUSES loudly (rebuild from empty, or keep
 * maintaining it by hand). A source vacuumed past the watermark also
 * fails loudly through the CDC kernel's own guard (rebuild the
 * index); the `fromV = 0` bootstrap anchor is exempt by definition.
 *
 * Rows whose text/vector column is NULL are absent from the index
 * (and a row that LOSES its payload on update is tombstoned without
 * re-ingest) — an index serves payloads, not nulls.
 */
object IndexSync {

  /** The sync watermark's ingest scope for a (table → index) pipe:
    * stable across calls, distinct per source table — two tables
    * syncing into one index (don't) would otherwise share a
    * watermark. */
  def ingestScope(tablePath: String): String =
    Versioned.ingestIdFor("idxsync", tablePath)

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The folded range plan for one sync: watermark, head, and the
    * change-key frames. None = already up to date. */
  private def plan(spark: SparkSession, tablePath: String,
      keyCol: String, idxPath: String, indexEmpty: => Boolean)
      : Option[(Int, Int, DataFrame, DataFrame)] = {
    val ingest = ingestScope(tablePath)
    val metas = GenLog.metas(spark, fsOf(spark, idxPath), idxPath)
    val w = GenLog.foldedBatchMaxes(metas).getOrElse(ingest, -1L)
    val toV = Versioned.latestVersion(spark, tablePath)
    require(toV > 0, s"syncIndexes: no committed versions at $tablePath")
    val fromV =
      if (w >= 0) w.toInt
      else {
        require(indexEmpty,
          s"syncIndexes: $idxPath is non-empty but has no sync " +
            s"watermark for $tablePath — it was built out of band, so " +
            "the sync cannot know which rows it holds; bootstrap CDC " +
            "sync from an EMPTY index (the first sync ingests the " +
            "whole current state), or keep maintaining this one by hand")
        0
      }
    if (toV <= fromV) None
    else {
      val ch = Versioned.changesAuto(spark, tablePath, keyCol, fromV, toV)
        .localCheckpoint()
      Some((fromV, toV,
        ch.filter(col("change_type").isin("update", "delete"))
          .select(keyCol),
        ch.filter(col("change_type").isin("insert", "update"))
          .select(keyCol)))
    }
  }

  /** Drain the table's CDC feed into a TEXT index. Returns the folded
    * source-version range `(fromV, toV]`; `fromV == toV` = already up
    * to date. All the table's data columns ride along as doc metadata
    * (the filtered-serve sidecar). */
  def syncSearch(spark: SparkSession, tablePath: String, keyCol: String,
      textCol: String, idx: Search.Index): (Int, Int) =
    plan(spark, tablePath, keyCol, idx.path,
        Search.stats(spark, idx)._1 == 0L) match {
      case None =>
        val v = Versioned.latestVersion(spark, tablePath)
        (v, v)
      case Some((fromV, toV, delKeys, upKeys)) =>
        if (fromV > 0) Search.delete(delKeys, keyCol, idx)
        val rows = Versioned
          .currentForKeys(spark, tablePath, keyCol, upKeys, toV)
          .filter(col(textCol).isNotNull)
        Search.appendBatch(rows, keyCol, textCol, idx, batchId = toV,
          ingestId = ingestScope(tablePath))
        (fromV, toV)
    }

  /** STREAMING sync: the [[syncSearch]] loop as a Structured
    * Streaming pipe — the admission-controlled V2 source
    * (`readStream.format("graft")`, capped epochs) feeds
    * `foreachBatch`, and each epoch folds its TOUCHED keys into the
    * text index: tombstone the touched set (dead-id deletes are
    * no-ops), then re-ingest the keys' current rows resolved at the
    * epoch's end version through the bounded
    * [[Versioned.currentForKeys]] point-lookup. Exactly-once rides
    * the gen-log batch markers keyed by the EPOCH id under a
    * checkpoint-derived ingest scope (a replayed epoch is recognized
    * even after index compaction folded its marker; a rebuilt stream
    * under a fresh checkpoint re-delivers under its own scope); a
    * crash between the tombstone and the append replays the epoch
    * and converges, exactly the batch-sync contract. The index stays
    * continuously one marker away from a fresh-build-equivalent
    * serve — `Trigger.AvailableNow` (the default) drains and stops,
    * a processing-time trigger keeps following the table. The
    * BATCH-face watermark ([[ingestScope]], version-keyed) and this
    * stream's epoch-keyed markers are independent scopes — pick ONE
    * pipe per index and stay with it (mixing them double-ingests,
    * the same rule as feeding one index from two tables). */
  def syncSearchStream(spark: SparkSession, tablePath: String,
      keyCol: String, textCol: String, idx: Search.Index,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxVersionsPerTrigger: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    syncStream(spark, tablePath, keyCol, idx.path, checkpointDir,
        trigger, maxVersionsPerTrigger, "syncSearchStream") {
      (rows, touched, id, ingest) =>
        // a still-empty index (bootstrap epoch) skips the pointless
        // tombstone gen
        if (Search.stats(spark, idx)._1 > 0L)
          Search.delete(touched, keyCol, idx)
        Search.appendBatch(rows.filter(col(textCol).isNotNull),
          keyCol, textCol, idx, batchId = id, ingestId = ingest)
        ()
    }

  /** STREAMING sync into a VECTOR index — [[syncSearchStream]]'s
    * contract with [[VecIndex]] as the target (key → `id`, `vecCol` →
    * `vec`, remaining columns as metadata; rows with a NULL vector
    * stay absent). */
  def syncVectorStream(spark: SparkSession, tablePath: String,
      keyCol: String, vecCol: String, idx: VecIndex.Index,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxVersionsPerTrigger: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    syncStream(spark, tablePath, keyCol, idx.path, checkpointDir,
        trigger, maxVersionsPerTrigger, "syncVectorStream") {
      (rows, touched, id, ingest) =>
        if (VecIndex.countVecs(spark, idx) > 0L)
          VecIndex.delete(touched, keyCol, idx)
        val cur = rows.filter(col(vecCol).isNotNull)
        val meta = cur.columns
          .filterNot(c => c == keyCol || c == vecCol)
        VecIndex.appendBatch(
          cur.select(Seq(col(keyCol).as("id"),
            col(vecCol).as("vec")) ++ meta.map(col): _*),
          idx, batchId = id, ingestId = ingest)
        ()
    }

  /** Shared streaming-sync scaffold: V2 source → per-epoch fold of
    * the touched keys' rows resolved at the epoch's end version.
    * `foldEpoch(rows, touched, epochId, ingest)` runs only for
    * unapplied, non-empty epochs (the gen-log marker guard is read
    * from the INDEX path) and must end with a batch-marked append so
    * the epoch commits atomically. */
  private def syncStream(spark: SparkSession, tablePath: String,
      keyCol: String, idxPath: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      maxVersionsPerTrigger: Int, face: String)(
      foldEpoch: (DataFrame, DataFrame, Long, String) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(maxVersionsPerTrigger >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
    val ckptPath = new org.apache.hadoop.fs.Path(checkpointDir)
    val ingest = Versioned.ingestIdFor("idxsyncstream",
      ckptPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(ckptPath).toString)
    spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
      .load(tablePath).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val metas = GenLog.metas(spark, fsOf(spark, idxPath), idxPath)
        if (!GenLog.batchApplied(metas, id, ingest) && !b.isEmpty) {
          val touched = b.select(col(keyCol)).distinct()
            .localCheckpoint()
          require(touched.filter(col(keyCol).isNull).isEmpty,
            s"$face: NULL keys in the epoch from $tablePath — an " +
              "index cannot address a null doc id; delete the " +
              "null-key rows")
          val vHi = b.select(max(col("__v")).cast("int")).head()
            .getInt(0)
          foldEpoch(Versioned.currentForKeys(spark, tablePath, keyCol,
            touched, vHi), touched, id, ingest)
        }
        ()
      }
      .start()
  }

  /** Drain the table's CDC feed into a VECTOR index. The key column
    * ingests as `id`, `vecCol` as `vec`; remaining data columns ride
    * along as metadata (the filtered-serve columns). Returns the
    * folded source-version range `(fromV, toV]`. */
  def syncVector(spark: SparkSession, tablePath: String, keyCol: String,
      vecCol: String, idx: VecIndex.Index): (Int, Int) =
    plan(spark, tablePath, keyCol, idx.path,
        VecIndex.countVecs(spark, idx) == 0L) match {
      case None =>
        val v = Versioned.latestVersion(spark, tablePath)
        (v, v)
      case Some((fromV, toV, delKeys, upKeys)) =>
        if (fromV > 0) VecIndex.delete(delKeys, keyCol, idx)
        val cur = Versioned
          .currentForKeys(spark, tablePath, keyCol, upKeys, toV)
          .filter(col(vecCol).isNotNull)
        val meta = cur.columns
          .filterNot(c => c == keyCol || c == vecCol)
        val rows = cur.select(Seq(col(keyCol).as("id"),
          col(vecCol).as("vec")) ++ meta.map(col): _*)
        VecIndex.appendBatch(rows, idx, batchId = toV,
          ingestId = ingestScope(tablePath))
        (fromV, toV)
    }
}
