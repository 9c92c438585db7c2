package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed refusal from a FILTERED index serve ([[Search]] or
  * [[VecIndex]]): the metadata predicate references a column the
  * index does not store — ingest the column next to the payload, a
  * serve never post-filters. An `IllegalArgumentException` subclass
  * (existing callers unchanged); [[Hybrid.hybridTopK]]'s lexical
  * fallback catches exactly THIS CLASS, so any other argument error
  * propagates instead of silently switching retrieval semantics. */
final class FilterUnresolved(msg: String, cause: Throwable)
    extends IllegalArgumentException(msg, cause)


/**
 * Inverted-index text search AT REST — the serve path of a corpus
 * search/retrieval system. The index is a token-bucket-partitioned
 * parquet postings table (the same bucket-at-rest layout as
 * [[Dedup.jaccardRestInit]] and the IVF index in Similarity): a
 * conjunctive query reads ONLY its terms' buckets (static partition
 * pruning on literal bucket values) and, inside each bucket file,
 * only the row groups whose tok min/max straddle a query term
 * (postings are written tok-sorted). At 100 TB the per-query read is
 * O(matched postings), never a corpus scan — index build cost is one
 * explode + one groupBy, paid once and amortized over every query.
 *
 * Lifecycle (since r8): the index is a LOG OF GENERATIONS, committed
 * the Iceberg way — the commit marker file IS the commit:
 *
 * - each ingest ([[writeIndex]], [[append]]) or [[delete]] claims the
 *   next generation number with an atomic put-if-absent claim file,
 *   writes its data under `post/gen=N/tb=*` / `docs/gen=N` /
 *   `tombs/gen=N`, then publishes by atomically renaming a staged
 *   marker to `commits/N`. The marker carries the generation's kind
 *   and its EXACT stats delta (doc count, token-length sum), so the
 *   BM25 corpus constants are always consistent with exactly the set
 *   of visible generations — there is no read-modify-write stats file
 *   and no torn window between postings and stats. A crash at any
 *   point leaves either an invisible orphan (no marker — swept by
 *   [[vacuum]]) or a complete generation;
 * - [[delete]] commits TOMBSTONES (and a negative stats delta measured
 *   against the live doc-length table): every query anti-joins the
 *   pruned postings read against the committed tombstone set before
 *   aggregating, so a corrected document can leave the index —
 *   delete + [[append]] is the reingest cycle. When no tombstones
 *   exist the anti-join is skipped at planning time;
 * - [[compact]] rewrites live postings as one BASE generation
 *   (absolute stats, tombstones applied), bounding read fan-in the
 *   way Versioned checkpoints do; [[vacuum]] reclaims generations
 *   below the newest base plus any stale claims/orphans.
 *
 * Concurrent appends are slot-safe (distinct generations via the
 * claim CAS, routed through the session's pluggable
 * [[graft.io.LogStore]]). [[compact]] and [[delete]] additionally
 * REFUSE (fail-loud) while a lower generation slot is claimed but
 * unpublished — an in-flight append publishing below a new base
 * would be invisible forever (then vacuumed), and one publishing
 * below a tombstone snapshot would be wrongly killed by it; waiting
 * the appender out closes both races. vacuum keeps the same
 * single-maintainer contract as [[graft.io.Versioned.vacuum]].
 */
object Search {

  final case class Index(path: String, nBuckets: Int)

  // The generation-log machinery was extracted to [[graft.io.GenLog]]
  // in r10 (the vector indexes share it); these aliases keep Search's
  // internals and its concurrent-lifecycle specs reading naturally.
  // Marker fields here: a = doc-count delta, b = token-length-sum
  // delta, n = nBuckets.
  import graft.io.GenLog
  import graft.io.GenLog.{Meta, KindSeg, KindDel, KindBase}

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(c: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(c), lit(n)).cast("int")

  // ---- generation log (delegates) ----

  private def commitsDir(path: String) = GenLog.commitsDir(path)

  private def metas(spark: SparkSession, f: FileSystem,
      path: String): Seq[Meta] = GenLog.metas(spark, f, path)

  private def liveMetas(spark: SparkSession, f: FileSystem,
      path: String): Seq[Meta] = GenLog.liveMetas(spark, f, path)

  private[pipeline] def claimGen(spark: SparkSession, f: FileSystem,
      path: String): Int = GenLog.claimGen(spark, f, path)

  private[pipeline] def unpublishedGens(spark: SparkSession, f: FileSystem,
      path: String): Seq[Int] = GenLog.unpublishedGens(spark, f, path)

  private def requireNoInflightBelow(spark: SparkSession, f: FileSystem,
      path: String, g: Int, op: String): Unit =
    GenLog.requireNoInflightBelow(spark, f, path, g, op)

  private[pipeline] def publish(spark: SparkSession, f: FileSystem,
      path: String, g: Int, kind: String, nDocs: Long, sumDlen: Long,
      nBuckets: Int): Unit =
    GenLog.publish(spark, f, path, g, kind, nDocs, sumDlen, nBuckets)

  /** Tokenized postings for one document shard. */
  private def postingsOf(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")),
        size(split(col(textCol), " ")).cast("long").as("dlen"))
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("tf"), first("dlen").as("dlen"),
        collect_list(col("pos")).as("positions"))

  /** Write one generation's postings + per-doc lengths, then commit. */
  private def commitSegment(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int, kind: String): Int = {
    val spark = df.sparkSession
    val f = fsOf(spark, path)
    val g = claimGen(spark, f, path)
    writeSegmentAt(df, idCol, textCol, path, nBuckets, kind, g)
  }

  /** Data write + publish for an ALREADY-CLAIMED generation slot —
    * split from [[commitSegment]] so the concurrent-lifecycle spec can
    * interleave claim and publish around a compaction. */
  private[pipeline] def writeSegmentAt(df: DataFrame, idCol: String,
      textCol: String, path: String, nBuckets: Int, kind: String,
      g: Int): Int = {
    val spark = df.sparkSession
    val f = fsOf(spark, path)
    postingsOf(df, idCol, textCol)
      .withColumn("tb", bucketOf(col("tok"), nBuckets))
      .repartition(col("tb")).sortWithinPartitions("tok")
      // small row groups so the tok-sorted min/max skipping actually
      // bites inside fat buckets (the 128 MB default makes one group
      // per file, turning every term probe into a full-bucket decode)
      .write.mode("overwrite").option("parquet.block.size", 1 << 20)
      .partitionBy("tb").parquet(s"$path/post/gen=$g")
    // per-doc token lengths: one row per doc — what a later delete of
    // bare ids needs to subtract exact stats without scanning
    // postings. Every OTHER ingest column is doc METADATA, stored
    // verbatim next to dlen — the substrate of the FILTERED serve
    // (searchBm25/searchAll's `filter` semi-joins this sidecar, so
    // top-k stays full among matching docs).
    val meta = df.columns.toSeq.filterNot(c => c == idCol || c == textCol)
    val clash = meta.filter(DocDerived)
    require(clash.isEmpty, s"metadata column(s) ${clash.mkString(", ")} " +
      "collide with index-derived doc-sidecar columns " +
      "(id/dlen/gen/g/tok/tb/tf/pos/positions)")
    df.select(Seq(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("dlen")) ++
        meta.map(col): _*)
      .write.mode("overwrite").parquet(s"$path/docs/gen=$g")
    // coalesce: an EMPTY base segment is the legitimate streaming
    // bootstrap (writeIndex(df.limit(0)) then appendBatch per trigger)
    val st = df.select(size(split(col(textCol), " ")).cast("long").as("dlen"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("dlen"), lit(0L)).as("sum_dlen")).head()
    publish(spark, f, path, g, kind, st.getLong(0), st.getLong(1), nBuckets)
    g
  }

  // ---- ingest / delete / maintenance ----

  /** Build a FRESH index at `path` (drops any existing state):
    * generation 1 is a base segment. */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Index = {
    val f = fsOf(df.sparkSession, path)
    f.delete(new Path(path), true)
    commitSegment(df, idCol, textCol, path, nBuckets, KindBase)
    Index(path, nBuckets)
  }

  /** Open an existing committed index (reads nBuckets from the log). */
  def open(spark: SparkSession, path: String): Index =
    Index(path, liveMetas(spark, fsOf(spark, path), path).last.n)

  /**
   * Incremental index ingest: fold a NEW shard of documents into an
   * existing index as its own generation. Ingest cost is O(shard),
   * never O(corpus) — the same at-rest fold contract as
   * [[Dedup.jaccardRestMerge]] — and the generation marker commits
   * postings and stats delta ATOMICALLY (no torn window).
   *
   * Caller contract (documented, not scanned-for): shard doc ids must
   * be new OR previously [[delete]]d — reingest of a live id would
   * double its postings. Concurrent appends are safe (distinct
   * generation slots via the claim CAS).
   */
  def append(df: DataFrame, idCol: String, textCol: String,
      idx: Index): Index = {
    commitSegment(df, idCol, textCol, idx.path, idx.nBuckets, KindSeg)
    idx
  }

  /** EXACTLY-ONCE streaming ingest (use from `foreachBatch`): one
    * generation per micro-batch, idempotent on replay — the batch id
    * rides in the marker kind (`seg@<id>`), and compaction records the
    * max folded batch id on its base marker, so a batch re-delivered
    * even AFTER compact+vacuum reclaimed its per-batch marker is
    * recognized and skipped. The same batch-marker scheme as
    * [[VecIndex.appendBatch]] / [[graft.io.Versioned.appendBatch]];
    * with it, `readStream … .foreachBatch(Search.appendBatch(_, "id",
    * "text", idx, _))` is a continuously-ingesting text index whose
    * postings and BM25 corpus constants are always one marker away
    * from consistent.
    *
    * `ingestId` scopes the replay guard: Structured Streaming batch
    * ids RESTART AT 0 for every new checkpoint location, so a fresh
    * ingest pointed at an existing compacted index would have its
    * early batches silently skipped by the folded watermark of the
    * OLD ingest. Pass the streaming query's (checkpoint-stable) id or
    * the checkpoint path — each ingest id carries its own watermark
    * ([[graft.io.GenLog.foldedBatchMaxes]]). The empty default keeps
    * the single-ingest legacy shape: correct only while the SAME
    * checkpoint feeds this index for its whole life. */
  def appendBatch(df: DataFrame, idCol: String, textCol: String,
      idx: Index, batchId: Long, ingestId: String = ""): Index = {
    val spark = df.sparkSession
    val f = fsOf(spark, idx.path)
    if (GenLog.batchApplied(GenLog.metas(spark, f, idx.path), batchId,
        ingestId)) idx
    else {
      commitSegment(df, idCol, textCol, idx.path, idx.nBuckets,
        GenLog.segKind(batchId, ingestId))
      idx
    }
  }

  /**
   * Delete documents by id (tombstone generation): `ids` is a
   * one-column frame of doc ids. Every subsequent query anti-joins the
   * postings read against the tombstone set, and the generation's
   * negative stats delta (count + token-length sum of the MATCHED LIVE
   * docs, from the `docs` sidecar — never a postings scan) keeps the
   * BM25 corpus constants exact. Deleting an unknown or already-dead
   * id is a no-op in both the postings view and the stats.
   * delete + [[append]] is the reingest cycle for a corrected doc.
   */
  def delete(ids: DataFrame, idCol: String, idx: Index): Index = {
    val spark = ids.sparkSession
    val f = fsOf(spark, idx.path)
    val g = claimGen(spark, f, idx.path)
    // an unpublished lower-gen append could land after this tombstone's
    // stats snapshot and be wrongly killed by it — refuse until it
    // publishes (fail-loud; see requireNoInflightBelow)
    requireNoInflightBelow(spark, f, idx.path, g, "delete")
    val live = liveDocs(spark, f, idx.path)
    val victims = live.join(
        ids.select(col(idCol).as("id")).distinct(), "id")
      .localCheckpoint() // pin: stats and tombstones must agree exactly
    victims.select("id")
      .write.mode("overwrite").parquet(s"${idx.path}/tombs/gen=$g")
    val st = victims.agg(count(lit(1)).as("n"),
      coalesce(sum("dlen"), lit(0L)).as("s")).head()
    publish(spark, f, idx.path, g, KindDel, -st.getLong(0), -st.getLong(1),
      idx.nBuckets)
    idx
  }

  /** PREDICATE tombstones — the GDPR/retention shape
    * (`DELETE FROM idx WHERE source = 'bad-crawl'`): resolve every
    * LIVE doc whose stored metadata (the docs sidecar ingested next
    * to `(id, text)`) matches `predicate`, then commit through the
    * ordinary gen-aware [[delete]] — identical lifecycle (tombstone
    * generation, stats delta, fold/vacuum behavior) and spec-pinned
    * equivalent to delete-by-ids on the same predicate. A predicate
    * referencing an un-stored column fails loudly
    * ([[FilterUnresolved]]); a predicate matching nothing commits an
    * empty tombstone generation (harmless, like deleting unknown
    * ids). Returns the number of matched live docs. */
  def deleteWhere(spark: SparkSession, idx: Index,
      predicate: org.apache.spark.sql.Column): Long = {
    val ids = filteredDocIds(spark, idx, predicate).localCheckpoint()
    delete(ids, "id", idx)
    ids.count()
  }

  /**
   * Compact: rewrite the live postings (tombstones applied) as ONE new
   * BASE generation with absolute stats, bounding the read fan-in the
   * way Versioned checkpoints do. Prior generations stay on disk for
   * in-flight readers until [[vacuum]] reclaims them. Single
   * maintainer, like every compaction here.
   */
  /** ONE-CALL auto-maintenance for the text index: run whatever the
    * metas-only policy ([[graft.io.GenLog.maintainPlan]]) calls for —
    * full compact (physical tombstone purge + bucket re-level) past
    * `purgeFrac`, LSM seg-merge fold past `deltaGens`, nothing
    * otherwise — then vacuum reclaimable generations. Returns the
    * (action, detail) list taken; the indexes' ops loop, mirroring
    * [[graft.io.Versioned.maintain]] for tables. */
  def maintain(spark: SparkSession, idx: Index,
      cfg: GenLog.MaintainConfig = GenLog.MaintainConfig())
      : Seq[(String, String)] = {
    val f = fsOf(spark, idx.path)
    val actions = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    GenLog.maintainPlan(spark, f, idx.path, cfg) match {
      case "full" =>
        compact(spark, idx)
        actions += (("compact", "tombstone purge + bucket re-level"))
      case "fold" =>
        compactIncremental(spark, idx)
        actions += (("fold", "LSM seg-merge, O(delta)"))
      case _ => ()
    }
    val got = vacuum(spark, idx)
    if (got.nonEmpty)
      actions += (("vacuum", s"reclaimed ${got.size} generation(s)"))
    if (actions.isEmpty) Seq(("noop", "below every threshold"))
    else actions.toSeq
  }

  def compact(spark: SparkSession, idx: Index): Index = {
    val f = fsOf(spark, idx.path)
    val g = claimGen(spark, f, idx.path)
    // an unpublished lower-gen append publishing AFTER this base commits
    // would sit below the base — invisible to liveMetas, then vacuumed:
    // silent loss. Refuse until the appender publishes.
    requireNoInflightBelow(spark, f, idx.path, g, "compact")
    postings(spark, idx)
      .select("id", "tok", "tf", "dlen", "positions") // drop gen/tb
      .withColumn("tb", bucketOf(col("tok"), idx.nBuckets))
      .repartition(col("tb")).sortWithinPartitions("tok")
      .write.mode("overwrite").option("parquet.block.size", 1 << 20)
      .partitionBy("tb").parquet(s"${idx.path}/post/gen=$g")
    liveDocs(spark, f, idx.path)
      .write.mode("overwrite").parquet(s"${idx.path}/docs/gen=$g")
    // the new base's stats ARE the marker-delta sums over the read set
    // (base absolute, seg +, del − with only LIVE victims counted) —
    // the invariant the markers exist to provide; no third docs scan
    val ms = liveMetas(spark, f, idx.path).filter(_.gen < g)
    val (n, s) = (ms.map(_.a).sum, ms.map(_.b).sum)
    // record the max folded streaming batch id PER INGEST on the base,
    // so the exactly-once appendBatch guard survives vacuum reclaiming
    // the folded per-batch seg@<id> markers without ever crossing
    // ingest scopes (fresh checkpoints restart batch ids at 0)
    val watermarks = GenLog.foldedBatchMaxes(ms)
    GenLog.publish(spark, f, idx.path, g, KindBase, n, s, idx.nBuckets,
      fold = watermarks.getOrElse("", -1L), folds = watermarks - "")
    idx
  }

  /**
   * INCREMENTAL compact — the LSM-style SEG-MERGE: fold the delta
   * generations' postings into ONE merged set of bucket dirs under
   * the new base (tombstones applied to the merged rows), and CARRY
   * every path of the previous base by reference (`_CARRY.tsv`
   * manifest; a bucket may then have the base's dir AND the merged
   * delta dir — readers union them). Fold cost is O(delta), NEVER
   * O(base): this is the only shape that survives 100 TB text, where
   * any realistic document delta contains tokens from essentially
   * every hash bucket — a dirty-bucket base rewrite would degenerate
   * to the full compact. Each fold adds at most one file set per
   * bucket; the full [[compact]] is the re-leveling defrag that
   * collapses them and purges tombstoned postings physically.
   *
   * The live tombstone set is consolidated into the new base's own
   * `tombs/gen=<base>` snapshot because carried postings still hold
   * dead docs' rows — the read-side anti-join keeps them hidden
   * (gen-aware: the snapshot rides at the base's gen, so fold-merged
   * rows outrank it and carried rows don't).
   *
   * The docs sidecar (one row per live doc — orders of magnitude
   * smaller than postings with their position arrays) is rewritten
   * consolidated each fold, keeping [[delete]]'s stats lookups
   * single-generation-bounded.
   *
   * Falls back to [[compact]] when no base exists yet. No-op (returns
   * the index, no new generation) when nothing committed above the
   * base. Same structural-commit guard as [[compact]].
   */
  def compactIncremental(spark: SparkSession, idx: Index,
      maxSetsPerBucket: Int = 4): Index = {
    require(maxSetsPerBucket >= 2,
      s"maxSetsPerBucket must be >= 2, got $maxSetsPerBucket")
    val f = fsOf(spark, idx.path)
    val ms = liveMetas(spark, f, idx.path)
    val baseGen = ms.filter(_.kind == KindBase).map(_.gen).maxOption
      .getOrElse(return compact(spark, idx))
    if (ms.forall(_.gen == baseGen)) return idx // nothing to fold
    val g = claimGen(spark, f, idx.path)
    requireNoInflightBelow(spark, f, idx.path, g, "compactIncremental")
    val segs = ms.filter(m => m.kind != KindDel && m.gen != baseGen)
    // per-segment bucket dirs (segments never carry; an empty segment
    // — zero-row streaming batch — contributes no dirs)
    val segPaths = segs.flatMap { m =>
      val dir = new Path(s"${idx.path}/post/gen=${m.gen}")
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("tb="))
        .map(_.getPath.toString)
    }
    val dels = ms.filter(_.kind == KindDel)
    // LEVELING: each fold normally adds one merged file set per bucket
    // (the LSM trade); a bucket whose carried sets reached
    // `maxSetsPerBucket` joins THIS merge — all its paths fold into
    // the new generation and drop from the carry, so no bucket's live
    // path count ever exceeds the cap, at the amortized cost of
    // re-merging one overgrown bucket's data (never the whole base)
    val eff = GenLog.effectiveParts(spark, f, idx.path, "post", baseGen)
    val (leveled, kept) = eff.partition {
      case (_, ps) => ps.size >= maxSetsPerBucket
    }
    val srcPaths = segPaths ++ leveled.values.flatten
    if (srcPaths.nonEmpty) {
      // merge the delta segments (and any leveled buckets) — never the
      // whole base; tombstones applied gen-aware while we're here
      val src = spark.read.option("basePath", s"${idx.path}/post")
        .parquet(srcPaths: _*)
      antiTombs(spark, f, idx.path, ms, src)
        .select("id", "tok", "tf", "dlen", "positions")
        .withColumn("tb", bucketOf(col("tok"), idx.nBuckets))
        .repartition(col("tb")).sortWithinPartitions("tok")
        .write.mode("overwrite").option("parquet.block.size", 1 << 20)
        .partitionBy("tb").parquet(s"${idx.path}/post/gen=$g")
    } else f.mkdirs(new Path(s"${idx.path}/post/gen=$g"))
    // carry every KEPT path of the previous base (its own dirs +
    // whatever it carried — addresses copy forward, no transitive
    // walk); leveled buckets live in this generation's own dirs now
    val carried = kept.toSeq.flatMap { case (k, ps) => ps.map(k -> _) }
    GenLog.writeCarry(spark, f, idx.path, "post", g, carried)
    // docs sidecar: same seg-merge — fold the delta segments' rows
    // (tombstones applied gen-aware, so a reingested doc keeps exactly
    // its newest dlen row) and carry the base's docs by reference;
    // without this the sidecar rewrite would be the fold's O(corpus)
    // floor. The docs unit is the whole gen dir (no partition
    // subdirs), carried under a synthetic `g=<gen>` label.
    val segDocDirs = segs
      .map(m => new Path(s"${idx.path}/docs/gen=${m.gen}"))
      .filter(d => f.exists(d) && f.listStatus(d)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.toString)
    def docsDirIfData(x: Int): Seq[(String, String)] = {
      val d = f.makeQualified(new Path(s"${idx.path}/docs/gen=$x"))
      if (f.exists(d) && f.listStatus(d)
          .exists(_.getPath.getName.endsWith(".parquet")))
        Seq(s"g=$x" -> d.toString)
      else Nil
    }
    // docs sets level under the same cap: once the carried dirs reach
    // it, fold them all (plus the seg docs) into this generation's
    // consolidated sidecar and carry nothing older
    val prevDocs =
      GenLog.carryEntries(spark, f, idx.path, "docs", baseGen) ++
        docsDirIfData(baseGen)
    val levelDocs = prevDocs.size >= maxSetsPerBucket
    val docSrc = segDocDirs ++
      (if (levelDocs) prevDocs.map(_._2) else Nil)
    if (docSrc.nonEmpty) {
      val d = spark.read.option("basePath", s"${idx.path}/docs")
        .option("mergeSchema", "true") // metadata added mid-life: null
        .parquet(docSrc: _*)
      val resolved = antiTombs(spark, f, idx.path, ms, d)
      // carry metadata columns through the fold (drop only the gen
      // partition column and the synthetic carry label)
      resolved.select(resolved.columns
          .filterNot(c => c == "gen" || c == "g").map(col).toSeq: _*)
        .write.mode("overwrite").parquet(s"${idx.path}/docs/gen=$g")
    } else f.mkdirs(new Path(s"${idx.path}/docs/gen=$g"))
    // the manifest lists the kept docs dirs plus this fold's own
    // merged-docs dir — docs files sit directly in the gen dir (no
    // partition subdirs), so the self-entry is what makes genPaths see
    // them; Spark ignores the underscore-prefixed _CARRY.tsv inside
    // the same dir
    GenLog.writeCarry(spark, f, idx.path, "docs", g,
      (if (levelDocs) Nil else prevDocs) ++ docsDirIfData(g))
    // consolidated tombstone snapshot for the carried buckets' dead
    // rows. The ORIGINAL kill generation rides as an explicit `tgen`
    // column — re-stamping everything at the new base's gen would make
    // the gen-aware anti-join kill a deleted-then-REINGESTED doc's
    // live rows (merged at a previous fold, carried at an older gen)
    // one fold later: silent missing documents. Multiple kills of one
    // id keep the newest gen (the only one that can outrank re-adds).
    val dead = GenLog.consolidateTombs(spark, f, idx.path,
      (dels.map(_.gen) :+ baseGen), g)
    val (n, s) = (ms.map(_.a).sum, ms.map(_.b).sum)
    val watermarks = GenLog.foldedBatchMaxes(ms)
    GenLog.publish(spark, f, idx.path, g, KindBase, n, s, idx.nBuckets,
      fold = watermarks.getOrElse("", -1L), folds = watermarks - "",
      dead = dead)
    idx
  }

  /**
   * Retention: reclaim generation dirs + markers BELOW the newest base
   * (their content is subsumed by the base rewrite — an INCREMENTAL
   * base's manifest-carried dirs are kept in place), stale claim files,
   * and orphan data dirs whose generation never committed (age-guarded
   * so an in-flight writer's work survives). Returns reclaimed
   * generation numbers. Must not run concurrently with readers of
   * pre-base generations (same contract as [[graft.io.Versioned.vacuum]]).
   */
  def vacuum(spark: SparkSession, idx: Index): Seq[Int] =
    GenLog.vacuum(spark, fsOf(spark, idx.path), idx.path,
      Seq("post", "docs", "tombs"))

  // ---- read side ----

  /** Live doc-length table: committed docs sidecars minus tombstones. */
  /** Doc-sidecar column names the index derives or the layout owns —
    * ingest metadata must not collide (`g` is the synthetic carry
    * label, `gen` the partition column). */
  private val DocDerived = Set("id", "dlen", "gen", "g", "tok", "tb",
    "tf", "positions", "pos")

  /** The committed, tombstone-resolved per-doc sidecar: (id, dlen)
    * plus every stored METADATA column. mergeSchema because
    * generations ingested before a metadata column existed simply
    * read it as null. */
  private def liveDocs(spark: SparkSession, f: FileSystem,
      path: String): DataFrame = {
    val ms = liveMetas(spark, f, path)
    // carry-aware (an incremental base carries the previous base's
    // docs dir by reference; see compactIncremental)
    val paths = ms.filter(_.kind != KindDel)
      .flatMap(m => GenLog.genPaths(spark, f, path, "docs", m.gen))
    // mergeSchema union memoized per committed generation set — a
    // generation written before a metadata column existed still reads
    // it as null (explicit-schema parquet reads null-fill missing
    // columns), with the footer-merge job paid once, not per serve
    val root = s"$path/docs"
    val st = GenLog.memoSchema(root, GenLog.commitsSig(f, path)) {
      spark.read.option("basePath", root).option("mergeSchema", "true")
        .parquet(paths: _*).schema
    }
    val docs = spark.read.schema(st).option("basePath", root)
      .parquet(paths: _*)
    val resolved = antiTombs(spark, f, path, ms, docs)
    resolved.select(resolved.columns
      .filterNot(c => c == "gen" || c == "g").map(col).toSeq: _*)
  }

  /** Matching doc ids for a metadata predicate over the docs sidecar
    * — the FILTERED-serve substrate (semi-joined below the top-k, so
    * k stays full among matching docs). A predicate referencing a
    * column the index doesn't store fails loudly listing the stored
    * ones. */
  private def filteredDocIds(spark: SparkSession, idx: Index,
      flt: org.apache.spark.sql.Column): DataFrame = {
    val docs = liveDocs(spark, fsOf(spark, idx.path), idx.path)
    val matched =
      try docs.filter(flt)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new FilterUnresolved(
            s"search filter does not resolve against the index at " +
              s"${idx.path} — stored doc columns: " +
              s"${docs.columns.mkString(", ")}. Ingest filter columns " +
              "next to (id, text) at writeIndex/append; a serve never " +
              "post-filters (that silently under-fills k).", e)
      }
    matched.select("id")
  }

  /** The committed, tombstone-resolved postings view. Filters applied
    * by callers on `tb`/`tok` push below the anti-join to the pruned
    * partition scan. */
  private def postings(spark: SparkSession, idx: Index): DataFrame = {
    val f = fsOf(spark, idx.path)
    val ms = liveMetas(spark, f, idx.path)
    // carry-aware: an incremental base contributes its own rewritten
    // bucket dirs PLUS its manifest-carried refs (which keep their
    // original gen partition value — exactly what the gen-aware
    // tombstone anti-join needs)
    val paths = ms.filter(_.kind != KindDel)
      .flatMap(m => GenLog.genPaths(spark, f, idx.path, "post", m.gen))
    // schema memoized per committed generation set (GenLog.memoSchema)
    // — skips the per-call footer-inference job on the serve path
    val root = s"${idx.path}/post"
    val st = GenLog.memoSchema(root, GenLog.commitsSig(f, idx.path)) {
      spark.read.option("basePath", root).parquet(paths: _*).schema
    }
    val post = spark.read.schema(st).option("basePath", root)
      .parquet(paths: _*)
    antiTombs(spark, f, idx.path, ms, post)
  }

  /** Anti-join `df` (which must carry its `gen` partition column)
    * against the read set's tombstones; skipped at planning time when
    * no delete generations are visible. A tombstone committed in
    * generation G kills rows from generations BEFORE G only — so a
    * reingested doc (delete in G, append in G+1) is live again, and
    * delete+append composes as the update cycle. */
  private def antiTombs(spark: SparkSession, f: FileSystem, path: String,
      ms: Seq[Meta], df: DataFrame): DataFrame = {
    // delete generations, PLUS an incremental base's consolidated
    // tombstone snapshot (its carried postings still hold the dead
    // docs' rows — only a FULL compact purges them physically). The
    // snapshot rides at the base's own gen, so rows the base rewrote
    // (gen = base) are never killed by it while carried rows
    // (gen < base) are.
    val dels = ms.filter(_.kind == KindDel) ++
      ms.filter(m => m.kind == KindBase &&
        f.exists(new Path(s"$path/tombs/gen=${m.gen}")))
    if (dels.isEmpty) df
    else {
      // ORIGINAL kill gens (explicit tgen in consolidated snapshots,
      // partition gen for plain deletes) — see GenLog.tombstones
      val t = GenLog.tombstones(spark, path,
          dels.map(m => s"$path/tombs/gen=${m.gen}"))
        .select(col("id").as("__tid"), col("tgen").as("__tgen"))
      df.join(t, df("id") === t("__tid") && df("gen") < t("__tgen"),
        "left_anti")
    }
  }

  /** Corpus constants (N, sum dlen) from the read set's marker
    * deltas — driver-side file reads, exact integer sums, zero data
    * scan. Public face: live doc count for emptiness/health checks
    * (the [[IndexSync]] bootstrap gate). */
  private[pipeline] def stats(spark: SparkSession, idx: Index): (Long, Long) = {
    val ms = liveMetas(spark, fsOf(spark, idx.path), idx.path)
    (ms.map(_.a).sum, ms.map(_.b).sum)
  }

  /** Conjunctive (AND-of-terms) search: docs containing EVERY query
    * term, scored by summed term frequency. Term buckets are computed
    * by running the index's own bucket expression on a literal frame —
    * never re-implemented driver-side — then pushed as literal
    * partition filters so planning-time pruning keeps the scan to
    * |terms| buckets. */
  def searchAll(spark: SparkSession, idx: Index, terms: Seq[String],
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    import spark.implicits._
    val buckets = terms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    val post = postings(spark, idx)
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
    filter.map(flt => post.join(filteredDocIds(spark, idx, flt),
        Seq("id"), "left_semi")).getOrElse(post)
      .groupBy("id")
      .agg(count_distinct(col("tok")).as("nhit"), sum("tf").as("score"))
      .filter(col("nhit") === terms.length)
      .select(col("id"), col("score"))
  }

  /**
   * Disjunctive search with a minimum-should-match: docs containing at
   * least `minMatch` of the terms, scored by summed tf and matched-term
   * count. minMatch = terms.length degrades to [[searchAll]];
   * minMatch = 1 is plain OR. Same bucket-pruned read.
   */
  def searchAny(spark: SparkSession, idx: Index, terms: Seq[String],
      minMatch: Int): DataFrame = {
    require(minMatch >= 1 && minMatch <= terms.length,
      s"minMatch $minMatch out of range for ${terms.length} terms")
    import spark.implicits._
    val buckets = terms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    postings(spark, idx)
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
      .groupBy("id")
      .agg(count_distinct(col("tok")).as("nhit"), sum("tf").as("score"))
      .filter(col("nhit") >= minMatch)
      .select(col("id"), col("nhit"), col("score"))
  }

  /**
   * Exact phrase search: docs where the terms appear CONSECUTIVELY, with
   * the occurrence count. Positions ride in the postings rows, so the
   * classic positional-index algorithm runs on the same bucket-pruned
   * read as every other query: explode each matched term's positions,
   * normalize to the would-be anchor (pos - term offset), and an anchor
   * hit by all |terms| offsets is one phrase occurrence. Cost is
   * O(matched postings positions) — never a text rescan.
   */
  def searchPhrase(spark: SparkSession, idx: Index,
      terms: Seq[String]): DataFrame = {
    require(terms.length >= 2, "phrase needs at least two terms")
    import spark.implicits._
    val termIdx = terms.zipWithIndex.toDF("tok", "ti")
    val distinctTerms = terms.distinct
    val buckets = distinctTerms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    postings(spark, idx)
      .filter(col("tb").isin(buckets: _*)
        && col("tok").isin(distinctTerms: _*))
      .join(termIdx, "tok")
      .select(col("id"), col("ti"), explode(col("positions")).as("pos"))
      .withColumn("anchor", col("pos") - col("ti"))
      .groupBy("id", "anchor")
      .agg(count_distinct(col("ti")).as("nt"))
      .filter(col("nt") === terms.length)
      .groupBy("id").agg(count(lit(1)).as("occurrences"))
  }

  /**
   * Ordered PROXIMITY search (phrase-with-slop): docs where the terms
   * appear IN ORDER with each consecutive gap at most 1 + slop token
   * positions, counting the qualifying position tuples. slop = 0
   * degenerates to exact adjacency ([[searchPhrase]] semantics). Runs
   * on the same bucket-pruned positional read: each term's positions
   * explode once, then |terms|-1 id-keyed equi-joins with a bounded
   * gap predicate chain them — per-doc position lists are short, so
   * the join fan-out is the per-doc occurrence product, never corpus-
   * shaped. The tuple count (not a boolean) keeps the result
   * oracle-checkable against an engine-independent recurrence.
   */
  def searchNear(spark: SparkSession, idx: Index, terms: Seq[String],
      slop: Int): DataFrame = {
    require(terms.length >= 2, "proximity needs at least two terms")
    require(slop >= 0, s"negative slop $slop")
    import spark.implicits._
    val distinctTerms = terms.distinct
    val buckets = distinctTerms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    val matched = postings(spark, idx)
      .filter(col("tb").isin(buckets: _*)
        && col("tok").isin(distinctTerms: _*))
      .select(col("id"), col("tok"), explode(col("positions")).as("pos"))
    def positionsOf(t: String, as: String) =
      matched.filter(col("tok") === t)
        .select(col("id"), col("pos").as(as))
    val first = positionsOf(terms.head, "p0")
    val chained = terms.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(positionsOf(t, s"p$i"), "id")
          .filter(col(s"p$i") - col(s"p${i - 1}") >= 1 &&
            col(s"p$i") - col(s"p${i - 1}") <= 1 + slop)
    }
    chained.groupBy("id").agg(count(lit(1)).as("occurrences"))
  }

  /** BM25 parameters (the standard Robertson defaults). */
  val Bm25K1: Double = 1.2
  val Bm25B: Double = 0.75

  /**
   * BM25-ranked disjunctive (OR-of-terms) search: top-k docs by the
   * Lucene-variant BM25 score (idf = ln((N-df+0.5)/(df+0.5) + 1), never
   * negative). Same bucket-pruned postings read as [[searchAll]]; df
   * per term falls out of the already-filtered postings (a term's df IS
   * its postings count), and dlen rides in the postings row, so the
   * serve path touches nothing but |terms| buckets plus the driver-side
   * marker stats. Scores are rounded before the id-tie-broken rank so
   * the exact top-k is reproducible across engines.
   */
  def searchBm25(spark: SparkSession, idx: Index, terms: Seq[String],
      topK: Int,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    import spark.implicits._
    // unresolvable filter fails at analysis time, before any job runs
    val fdocs = filter.map(flt => filteredDocIds(spark, idx, flt))
    val (nDocs, sumDlen) = stats(spark, idx)
    val avgdl = sumDlen.toDouble / nDocs
    val buckets = terms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    val postAll = postings(spark, idx)
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
    // Lucene's filtered-query semantics: the predicate restricts
    // CANDIDATES only — corpus constants (N, avgdl) and per-term df
    // stay unfiltered, so a doc's score never changes under a filter
    // and top-k stays FULL among matching docs (never post-filter an
    // unfiltered top-k; that silently under-fills)
    val dfPerTerm = postAll.groupBy("tok").agg(count(lit(1)).as("dfc"))
    val post = fdocs match {
      case None => postAll
      case Some(ids) => postAll.join(ids, Seq("id"), "left_semi")
    }
    post.join(dfPerTerm, "tok")
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("dfc") + 0.5) / (col("dfc") + 0.5)
          + 1.0))
      .withColumn("s",
        col("idf") * (col("tf") * (Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1)
            * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dlen") / avgdl)))
      .groupBy("id").agg(round(sum("s"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /**
   * [[searchBm25]] with the term set held in a DATAFRAME instead of a
   * driver-side Seq — the serve face for vocabulary EXPANSIONS
   * ([[searchFuzzy]]/[[searchPrefix]]), whose variant sets are
   * dictionary-derived and must never round-trip through the driver:
   * a short prefix over a corpus-scale (heavy-tailed, hundreds of
   * millions of tokens) vocabulary would otherwise collect millions
   * of variants and compile a multi-million-entry `In` literal —
   * driver OOM plus a codegen blow-up. `variants` is a one-column
   * (`tok`) frame; it is deduped, materialized once
   * (`localCheckpoint` — the expansion plan must not recompute for
   * the bucket probe AND the postings join), and semi-joined into
   * the postings read: the [[searchBm25Batch]] vocabulary-join shape.
   * The only driver collect is the distinct bucket list, bounded by
   * the index's `nBuckets` constant regardless of variant count.
   * Scores, rounding, and the (score desc, id) top-k tie-break
   * replicate [[searchBm25]] exactly; an empty variant frame yields
   * an empty (id, score) result.
   */
  def searchBm25Vocab(spark: SparkSession, idx: Index,
      variants: DataFrame, topK: Int,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    searchBm25VocabDf(spark, idx, variants.select("tok"), topK, filter)

  /** [[searchBm25Vocab]] that REUSES a per-token df the expansion
    * probe already computed when the variant frame carries a `__df`
    * column (the [[fuzzyExpandBatchDf]] shape — exact, the prunings
    * keep whole tokens): the serve plan then reads the postings ONCE
    * instead of scanning them a second time for the df aggregate. A
    * plain `tok`-only frame serves identically with the df aggregate
    * inline. */
  private def searchBm25VocabDf(spark: SparkSession, idx: Index,
      variants: DataFrame, topK: Int,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(topK > 0, s"topK $topK must be > 0")
    import spark.implicits._
    val carriesDf = variants.columns.contains("__df")
    val fdocs = filter.map(flt => filteredDocIds(spark, idx, flt))
    val (nDocs, sumDlen) = stats(spark, idx)
    val avgdl = sumDlen.toDouble / nDocs
    val v0 = (if (carriesDf) variants.select(col("tok"),
        col("__df").as("dfc"))
      else variants.select(col("tok")))
      .distinct().localCheckpoint()
    val v = v0.select("tok")
    val buckets = v.select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    if (buckets.isEmpty)
      return postings(spark, idx).select("id").limit(0)
        .withColumn("score", lit(0.0))
    // the variant frame is expansion-capped upstream (per-term
    // maxExpansions), so the broadcast is bounded by |terms|·cap
    val postAll = postings(spark, idx)
      .filter(col("tb").isin(buckets: _*))
      .join(broadcast(v), Seq("tok"), "left_semi")
    val dfPerTerm =
      if (carriesDf) broadcast(v0)
      else postAll.groupBy("tok").agg(count(lit(1)).as("dfc"))
    val post = fdocs match {
      case None => postAll
      case Some(ids) => postAll.join(ids, Seq("id"), "left_semi")
    }
    post.join(dfPerTerm, "tok")
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("dfc") + 0.5) / (col("dfc") + 0.5)
          + 1.0))
      .withColumn("s",
        col("idf") * (col("tf") * (Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1)
            * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dlen") / avgdl)))
      .groupBy("id").agg(round(sum("s"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /**
   * FUZZY term expansion against the index VOCABULARY: every stored
   * token within banded edit distance `maxDist` of a query term,
   * constrained to share the term's first `prefixLen` characters —
   * Lucene `FuzzyQuery` semantics (its `prefix_length`, here floored
   * at 1): the prefix constraint is what keeps the dictionary probe
   * PRUNED instead of a full-vocabulary distance scan. Returns
   * `(term, tok)` expansion pairs (distance 0 — the exact term, when
   * indexed — included), CAPPED per term at the `maxExpansions`
   * highest-df variants (df desc, tok asc tie-break) — Lucene's
   * `maxExpansions` rewrite cap (default 50), for the same reason:
   * a 1-char-prefix term over a heavy-tailed vocabulary expands
   * unboundedly, and the highest-df variants are the ones that can
   * actually rank.
   *
   * Scale shape: the probe reads ONE column (`tok`) of the postings
   * with the terms' prefix disjunction PUSHED to the parquet scan —
   * postings are written tok-sorted, so `StringStartsWith` row-group
   * stats skip every block outside the prefix ranges; the per-token
   * df (the cap's ranking key) is one aggregate over that same
   * pruned read; the banded `levenshtein(_, _, maxDist)` (gives up
   * after O(len·maxDist) work) runs only on the surviving
   * prefix-blocked candidates, exactly [[Dedup.editNearDup]]'s
   * blocking idea pointed at a dictionary. The cap is a
   * term-PARTITIONED window — no global sort, no driver collect.
   */
  def fuzzyExpand(spark: SparkSession, idx: Index, terms: Seq[String],
      maxDist: Int, prefixLen: Int = 1,
      maxExpansions: Int = 50): DataFrame =
    fuzzyExpandDf(spark, idx, terms, maxDist, prefixLen, maxExpansions)
      .select("term", "tok")

  /** [[fuzzyExpand]] keeping the probe's per-token postings count
    * (`__df`) so the serve can skip its own df pass — see
    * [[fuzzyExpandBatchDf]]. */
  private def fuzzyExpandDf(spark: SparkSession, idx: Index,
      terms: Seq[String], maxDist: Int, prefixLen: Int,
      maxExpansions: Int): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist $maxDist out of the useful fuzzy band [0, 2]")
    require(prefixLen >= 1,
      "prefixLen must be >= 1: the shared prefix is what keeps the " +
        "vocabulary probe pruned (Lucene FuzzyQuery prefix_length)")
    require(maxExpansions >= 1,
      s"maxExpansions $maxExpansions must be >= 1 (Lucene FuzzyQuery " +
        "maxExpansions — the rewrite cap that bounds the variant set)")
    val ts = terms.distinct
    require(ts.forall(_.length >= prefixLen),
      s"every term needs at least prefixLen=$prefixLen characters")
    val preFilter = ts
      .map(t => col("tok").startsWith(lit(t.take(prefixLen))))
      .reduce(_ || _)
    // vocabulary slice WITH per-token df (postings rows per tok = docs
    // containing it): one aggregate over the pruned tok-only read —
    // df is exact because the prefix filter prunes whole tokens
    val vocab = postings(spark, idx).filter(preFilter)
      .groupBy("tok").agg(count(lit(1)).as("__df"))
    val tf = spark.createDataFrame(ts.map(Tuple1(_))).toDF("term")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("__df").desc, col("tok").asc)
    vocab.join(broadcast(tf),
        col("tok").startsWith(substring(col("term"), 1, prefixLen)) &&
          abs(length(col("tok")) - length(col("term"))) <= maxDist &&
          levenshtein(col("tok"), col("term"), maxDist) >= 0)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxExpansions)
      .select("term", "tok", "__df")
  }

  /** PREFIX search (Lucene `PrefixQuery` / `term*` semantics): every
    * vocabulary token starting with a query prefix — capped per
    * prefix at the `maxExpansions` highest-df variants (Lucene's
    * rewrite cap, default 50; df desc, tok asc tie-break) — served
    * through the [[searchBm25Vocab]] path: the
    * autocomplete/search-as-you-type retrieval shape. The vocabulary
    * probe is the same pruned dictionary read as [[fuzzyExpand]]
    * (tok-only column read, `StringStartsWith` pushed to the
    * tok-sorted postings scan, per-token df from one aggregate over
    * it); the variant set stays a DATAFRAME end-to-end — never a
    * driver collect, so `searchPrefix(Seq("s"), …)` over a web-scale
    * vocabulary is a capped window + semi-join, not a driver OOM.
    * Nothing matching → empty result. */
  def searchPrefix(spark: SparkSession, idx: Index,
      prefixes: Seq[String], topK: Int,
      maxExpansions: Int = 50): DataFrame = {
    require(prefixes.nonEmpty, "empty prefix list")
    require(prefixes.forall(_.nonEmpty), "empty-string prefix " +
      "matches the whole vocabulary — give at least one character")
    require(maxExpansions >= 1,
      s"maxExpansions $maxExpansions must be >= 1 (Lucene PrefixQuery " +
        "rewrite cap — what bounds a 1-char prefix over a web-scale " +
        "vocabulary)")
    val ps = prefixes.distinct
    val preFilter = ps.map(p => col("tok").startsWith(lit(p)))
      .reduce(_ || _)
    val vocab = postings(spark, idx).filter(preFilter)
      .groupBy("tok").agg(count(lit(1)).as("__df"))
    val pf = spark.createDataFrame(ps.map(Tuple1(_))).toDF("prefix")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prefix").orderBy(col("__df").desc, col("tok").asc)
    val variants = vocab.join(broadcast(pf),
        col("tok").startsWith(col("prefix")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxExpansions)
      .select("tok", "__df")
    searchBm25VocabDf(spark, idx, variants, topK)
  }

  /** Typo-tolerant BM25 search: expand each query term against the
    * vocabulary ([[fuzzyExpand]] — per-term df-ranked cap at
    * `maxExpansions`, Lucene parity) and serve the UNION of expansion
    * variants through the [[searchBm25Vocab]] path — each variant
    * scores with its own df/idf (rare corrections outweigh common
    * ones, the property fuzzy retrieval wants) and the postings read
    * stays bucket-pruned to the expanded terms. The variant set stays
    * a DATAFRAME from expansion through serve (capped window →
    * semi-join — no driver collect, no literal in-list). A term with
    * no expansion contributes nothing; if NOTHING expands, the result
    * is empty. */
  def searchFuzzy(spark: SparkSession, idx: Index, terms: Seq[String],
      maxDist: Int, topK: Int, prefixLen: Int = 1,
      maxExpansions: Int = 50): DataFrame = {
    val variants = fuzzyExpandDf(spark, idx, terms, maxDist, prefixLen,
      maxExpansions).select("tok", "__df")
    searchBm25VocabDf(spark, idx, variants, topK)
  }

  /** Prefix-pushdown cap for the BATCH fuzzy expansion: the batch's
    * distinct term prefixes are collected only to build the
    * `StringStartsWith` scan filter; past this many the disjunction
    * stops paying (and the filter tree stops being codegen-friendly),
    * so the probe falls back to the full tok-only dictionary column
    * read — still one narrow column, never the corpus. */
  private val MaxPrefixPushdown = 64

  /** BATCHED [[fuzzyExpand]]: expansion pairs for a whole FRAME of
    * terms (col `term`) — the expansion is computed ONCE over the
    * batch's distinct vocabulary and shared by every query that uses
    * a term. Same per-term df-ranked `maxExpansions` cap; the term
    * frame is never collected (the only driver read is the distinct
    * PREFIX set for the scan pushdown, capped at
    * [[MaxPrefixPushdown]] — past that the probe reads the full
    * tok-only dictionary column instead). */
  def fuzzyExpandBatch(spark: SparkSession, idx: Index,
      terms: DataFrame, maxDist: Int, prefixLen: Int = 1,
      maxExpansions: Int = 50): DataFrame =
    fuzzyExpandBatchDf(spark, idx, terms, maxDist, prefixLen,
      maxExpansions).select("term", "tok")

  /** [[fuzzyExpandBatch]] KEEPING the per-token postings count
    * (`__df`) the expansion probe already aggregates: `__df` per tok
    * equals the serve-side df exactly (the prefix/bucket prunings both
    * keep whole tokens), so a downstream BM25 serve can reuse it and
    * skip its own second postings pass. */
  private def fuzzyExpandBatchDf(spark: SparkSession, idx: Index,
      terms: DataFrame, maxDist: Int, prefixLen: Int,
      maxExpansions: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist $maxDist out of the useful fuzzy band [0, 2]")
    require(prefixLen >= 1, "prefixLen must be >= 1")
    require(maxExpansions >= 1,
      s"maxExpansions $maxExpansions must be >= 1")
    import spark.implicits._
    val ts = terms.select(col("term")).distinct().localCheckpoint()
    require(ts.filter(col("term").isNull
        || length(col("term")) < prefixLen).isEmpty,
      s"every term needs at least prefixLen=$prefixLen characters " +
        "(null/short terms cannot anchor the vocabulary probe)")
    val prefs = ts.select(substring(col("term"), 1, prefixLen).as("p"))
      .distinct().limit(MaxPrefixPushdown + 1).as[String].collect()
    val dict = postings(spark, idx)
    val pruned =
      if (prefs.length <= MaxPrefixPushdown)
        dict.filter(prefs.map(p => col("tok").startsWith(lit(p)))
          .reduce(_ || _))
      else dict
    val vocab = pruned.groupBy("tok").agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("__df").desc, col("tok").asc)
    vocab.join(broadcast(ts),
        col("tok").startsWith(substring(col("term"), 1, prefixLen)) &&
          abs(length(col("tok")) - length(col("term"))) <= maxDist &&
          levenshtein(col("tok"), col("term"), maxDist) >= 0)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxExpansions)
      .select("term", "tok", "__df")
  }

  /** Rewrite a `(qid, terms)` query batch to its FUZZY-EXPANDED form:
    * each query's terms are replaced by the union of their
    * [[fuzzyExpandBatch]] variants (shared expansion across the
    * batch's vocabulary, per-term capped). A query whose terms ALL
    * fail to expand drops from the frame — the batch analogue of the
    * single-query "nothing expands → empty result". The result plugs
    * straight into [[searchBm25Batch]] / the batched hybrid serve. */
  def expandQueriesFuzzy(spark: SparkSession, idx: Index,
      queries: DataFrame, maxDist: Int, prefixLen: Int = 1,
      maxExpansions: Int = 50): DataFrame =
    expandQueriesFuzzyPairs(spark, idx, queries, maxDist, prefixLen,
        maxExpansions)
      .groupBy("qid").agg(collect_set(col("tok")).as("terms"))

  /** `(qid, tok)` DISTINCT-pair face of [[expandQueriesFuzzy]] —
    * the shape [[searchBm25BatchPairs]] consumes directly, skipping
    * the collect_set → re-explode round trip (two shuffles of the
    * bounded expansion plus re-materialization) the array-of-terms
    * contract forces. Materialized once (query-count-bounded: qids ×
    * capped variants); the query subtree executes exactly ONE job
    * (`explode_outer` keeps a null/empty term list visible as a null
    * term row, so the refusal check rides the same materialized
    * frame instead of re-running the caller's plan). */
  private[pipeline] def expandQueriesFuzzyPairs(spark: SparkSession,
      idx: Index, queries: DataFrame, maxDist: Int, prefixLen: Int = 1,
      maxExpansions: Int = 50): DataFrame = {
    val qt = queries
      .select(col("qid"), explode_outer(col("terms")).as("term"))
      .distinct().localCheckpoint()
    require(qt.filter(col("term").isNull).isEmpty,
      "expandQueriesFuzzy: a query has a null/empty term list — the " +
        "single-query contract refuses empty term lists, and a batch " +
        "must not silently drop the query")
    val exp = fuzzyExpandBatchDf(spark, idx, qt.select("term"), maxDist,
      prefixLen, maxExpansions)
    // materialize the expansion ONCE: the result feeds the batch BM25
    // serve, whose eager bucket collect and row count would otherwise
    // each re-execute this subtree's dictionary scan (the expansion is
    // query-count-bounded — qids × capped variants). `__df` (per-tok
    // postings count, exact) rides along so the serve skips its own
    // df aggregate — one postings scan in the fused plan, not two.
    qt.join(exp, "term")
      .select(col("qid"), col("tok"), col("__df")).distinct()
      .localCheckpoint()
  }

  /** Rewrite a `(qid, prefixes)` query batch to its PREFIX-EXPANDED
    * form: each query's prefixes replace themselves with the
    * per-prefix df-ranked top-`maxExpansions` vocabulary tokens
    * (expansion computed once over the batch's distinct prefixes,
    * shared across queries; same driver-bounded pushdown contract as
    * [[fuzzyExpandBatch]]). A query none of whose prefixes match
    * drops from the frame — the batch analogue of the single-query
    * empty result. Plugs into [[searchBm25Batch]] / the batched
    * hybrid serve. */
  def expandQueriesPrefix(spark: SparkSession, idx: Index,
      queries: DataFrame, maxExpansions: Int = 50): DataFrame =
    expandQueriesPrefixPairs(spark, idx, queries, maxExpansions)
      .groupBy("qid").agg(collect_set(col("tok")).as("terms"))

  /** `(qid, tok)` DISTINCT-pair face of [[expandQueriesPrefix]] —
    * same contract/rationale as [[expandQueriesFuzzyPairs]]: one
    * materialization of the query subtree (`explode_outer` keeps a
    * null/empty prefix list visible as a null row for the refusal),
    * one materialization of the expansion, no collect_set →
    * re-explode round trip before the batch BM25 serve. */
  private[pipeline] def expandQueriesPrefixPairs(spark: SparkSession,
      idx: Index, queries: DataFrame,
      maxExpansions: Int = 50): DataFrame = {
    require(maxExpansions >= 1,
      s"maxExpansions $maxExpansions must be >= 1")
    import spark.implicits._
    val qp = queries
      .select(col("qid"), explode_outer(col("prefixes")).as("prefix"))
      .distinct().localCheckpoint()
    require(qp.filter(col("prefix").isNull
        || length(col("prefix")) === 0).isEmpty,
      "expandQueriesPrefix: a query has a null/empty prefix list or " +
        "an empty-string prefix — the single-query contract refuses " +
        "both (an empty prefix matches the whole vocabulary), and a " +
        "batch must not silently drop the query")
    val ps = qp.select("prefix").distinct()
    val prefs = ps.limit(MaxPrefixPushdown + 1).as[String].collect()
    val dict = postings(spark, idx)
    val pruned =
      if (prefs.length <= MaxPrefixPushdown)
        dict.filter(prefs.map(p => col("tok").startsWith(lit(p)))
          .reduce(_ || _))
      else dict
    val vocab = pruned.groupBy("tok").agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prefix").orderBy(col("__df").desc, col("tok").asc)
    val exp = vocab.join(broadcast(ps),
        col("tok").startsWith(col("prefix")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxExpansions)
      .select("prefix", "tok", "__df")
    // materialize ONCE — same rationale as expandQueriesFuzzyPairs:
    // the downstream batch serve's eager checks would re-run the
    // dictionary scan per action on a lazy expansion; `__df` rides
    // along so the serve skips its own df aggregate (one postings
    // scan in the fused plan, not two)
    qp.join(exp, "prefix")
      .select(col("qid"), col("tok"), col("__df")).distinct()
      .localCheckpoint()
  }

  /** BATCHED prefix (autocomplete) search: [[searchPrefix]] for a
    * whole `(qid, prefixes)` frame in one pass — shared capped
    * expansion ([[expandQueriesPrefix]]) + the one-pass batched BM25
    * pipe. Per-query results identical to [[searchPrefix]]. */
  def searchPrefixBatch(spark: SparkSession, idx: Index,
      queries: DataFrame, topK: Int, maxExpansions: Int = 50,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val expanded = expandQueriesPrefixPairs(spark, idx, queries,
      maxExpansions)
    searchBm25BatchPairs(spark, idx, expanded, topK, filter)
  }

  /** BATCHED typo-tolerant BM25: [[searchFuzzy]] for a whole
    * `(qid, terms)` frame in one pass — the expansion is shared
    * across the batch vocabulary ([[expandQueriesFuzzy]]) and the
    * serve is the ordinary [[searchBm25Batch]] pipe (one
    * bucket-pruned postings read, shared df/idf, qid-partitioned
    * ranking). Per-query results identical to [[searchFuzzy]] on
    * that query alone; `filter` carries the same Lucene
    * filtered-query contract. */
  def searchFuzzyBatch(spark: SparkSession, idx: Index,
      queries: DataFrame, maxDist: Int, topK: Int, prefixLen: Int = 1,
      maxExpansions: Int = 50,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val expanded = expandQueriesFuzzyPairs(spark, idx, queries, maxDist,
      prefixLen, maxExpansions)
    searchBm25BatchPairs(spark, idx, expanded, topK, filter)
  }

  /**
   * BATCHED [[searchBm25]]: per-query BM25 top-k for a whole frame of
   * queries — `queries` is `(qid, terms: array<string>)` — in ONE
   * bucket-pruned postings pass, the offline-evaluation /
   * multi-tenant serve shape where looping the driver one query at a
   * time would fan out |queries| Spark jobs.
   *
   * Scale shape: the postings scan is pruned to the UNION of the
   * batch's term buckets (a driver collect bounded by the index's
   * `nBuckets` constant — never by query count), restricted to the
   * batch vocabulary by a distributed semi-join (query terms are
   * never collected), per-term df/idf is computed ONCE and shared
   * across queries, and the per-(qid, doc) scores fan out through one
   * broadcast join against the exploded (qid, tok) frame. Ranking is
   * a per-qid window — partitioned by query, never a global sort.
   * Scores and per-query ranking replicate [[searchBm25]] exactly
   * (same df, same rounding, same id tie-break); `filter` is the same
   * Lucene filtered-query contract (candidates restricted BELOW the
   * top-k, corpus constants unfiltered).
   */
  def searchBm25Batch(spark: SparkSession, idx: Index,
      queries: DataFrame, topK: Int,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(topK > 0, s"topK $topK must be > 0")
    // a filter that can't resolve fails HERE, at analysis time,
    // before any of the batch's eager work below runs (the fallback
    // path in hybridTopKBatch relies on the refusal being cheap)
    val fdocs = filter.map(flt => filteredDocIds(spark, idx, flt))
    // the single-query face refuses an empty term list loudly; the
    // batch face must not silently DROP such a query instead
    // (explode_outer keeps it visible as a null tok row on the
    // materialized frame — one job over the caller's subtree instead
    // of a separate refusal scan)
    // duplicate terms inside one query contribute once (the Seq face
    // dedups via its isin filter — same rule here)
    val qt = queries
      .select(col("qid"), explode_outer(col("terms")).as("tok"))
      .distinct().localCheckpoint()
    require(qt.filter(col("tok").isNull).isEmpty,
      "searchBm25Batch: a query has a null/empty term list — the " +
        "single-query contract refuses empty term lists, and a batch " +
        "must not silently drop the query")
    searchBm25BatchResolved(spark, idx, qt, topK, fdocs, None)
  }

  /** Serve face of [[searchBm25Batch]] for a `(qid, tok, __df)`
    * DISTINCT pair frame that is ALREADY materialized (the [[
    * expandQueriesFuzzyPairs]]/[[expandQueriesPrefixPairs]] output
    * shape): skips the array explode + distinct + re-materialization
    * the public contract pays, and reuses the expansion's exact
    * per-token df instead of re-aggregating the postings — ONE
    * postings scan in the serve plan. Pair rows must be distinct,
    * non-null, and backed by a checkpoint (the eager bucket collect
    * and row count below re-execute the frame's plan otherwise). */
  private[pipeline] def searchBm25BatchPairs(spark: SparkSession,
      idx: Index, pairs: DataFrame, topK: Int,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(topK > 0, s"topK $topK must be > 0")
    val fdocs = filter.map(flt => filteredDocIds(spark, idx, flt))
    val dfPre = pairs.select(col("tok"), col("__df").as("dfc")).distinct()
    searchBm25BatchResolved(spark, idx, pairs.select("qid", "tok"),
      topK, fdocs, Some(dfPre))
  }

  private def searchBm25BatchResolved(spark: SparkSession, idx: Index,
      qt: DataFrame, topK: Int, fdocs: Option[DataFrame],
      dfPre: Option[DataFrame]): DataFrame = {
    val (nDocs, sumDlen) = stats(spark, idx)
    val avgdl = sumDlen.toDouble / nDocs
    // ONE bounded action gives both serve-planning inputs: the
    // distinct bucket list (<= idx.nBuckets rows, an index constant
    // regardless of query count) AND the pair-frame row count.
    // The row count gates the broadcast choice: query-frame joins
    // broadcast only while the batch is SMALL (measured ~1.8× faster
    // end-to-end at 1M docs), while a millions-of-queries offline
    // batch legitimately plans as a shuffle join instead of capping
    // at driver memory.
    val perBucket = qt
      .groupBy(bucketOf(col("tok"), idx.nBuckets).as("tb")).count()
      .collect()
    val buckets = perBucket.map(_.getInt(0)).toSeq
    val qtRows = perBucket.map(_.getLong(1)).sum
    def small(df: DataFrame): DataFrame =
      if (qtRows <= 1000000L) broadcast(df) else df
    val vocab = qt.select("tok").distinct()
    val postAll = postings(spark, idx)
      .filter(col("tb").isin(buckets: _*))
      .join(small(vocab), Seq("tok"), "left_semi")
    // per-term df: reuse the expansion probe's exact count when the
    // caller carried it (dfPre — bounded, derived from a checkpointed
    // pair frame) instead of a SECOND aggregate pass over the
    // bucket-pruned postings scan
    val dfPerTerm = dfPre.map(small)
      .getOrElse(postAll.groupBy("tok").agg(count(lit(1)).as("dfc")))
    val post = fdocs match {
      case None => postAll
      case Some(ids) => postAll.join(ids, Seq("id"), "left_semi")
    }
    val perTok = post.join(dfPerTerm, "tok")
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("dfc") + 0.5) / (col("dfc") + 0.5)
          + 1.0))
      .withColumn("s",
        col("idf") * (col("tf") * (Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1)
            * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dlen") / avgdl)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    perTok.join(small(qt), "tok")
      .groupBy("qid", "id").agg(round(sum("s"), 6).as("score"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select("qid", "id", "score")
  }
}
