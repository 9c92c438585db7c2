package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Versioned

/** Table → index CDC sync ([[IndexSync]]): exactly-once drains of a
  * mutating Versioned table into its at-rest search/vector indexes —
  * the synced index must serve IDENTICALLY to one built fresh from
  * `current()` after every mutation mix, replays must fold nothing,
  * and out-of-band indexes must refuse loudly. */
class IndexSyncSpec extends SparkSpec {
  import spark.implicits._

  private def vec(id: Long): Array[Float] =
    Array.tabulate(32)(i => (((id * 31 + i * 13) % 17).toFloat - 8f) / 8f)

  private def rows(ks: Seq[Long], tag: String = ""): DataFrame =
    ks.map { k =>
      val toks = if (k % 2 == 0) s"alpha beta doc$k$tag"
        else s"alpha gamma doc$k$tag"
      (k, toks, vec(k + (if (tag.isEmpty) 0 else 1000)),
        if (k % 3 == 0) "en" else "xx")
    }.toDF("k", "text", "vec", "lang")

  private def rmDir(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def freshSearch(tbl: String, path: String): Search.Index = {
    rmDir(path)
    val cur = Versioned.current(spark, tbl, "k")
    Search.writeIndex(cur.limit(0), "k", "text", path, nBuckets = 8)
    Search.append(cur.filter(col("text").isNotNull), "k", "text",
      Search.open(spark, path))
  }

  private val cents = (0 until 4)
    .map(i => (i.toLong, vec(i))).toDF("cid", "cvec")

  private def freshVec(tbl: String, path: String): VecIndex.Index = {
    rmDir(path)
    val cur0 = Versioned.current(spark, tbl, "k")
      .filter(col("vec").isNotNull)
    val meta = cur0.columns.filterNot(c => c == "k" || c == "vec")
    val cur = cur0.select(Seq(col("k").as("id"), col("vec")) ++
      meta.map(col): _*)
    VecIndex.init(cur, 32, path, centroids = Some(cents), cbBuckets = 2)
  }

  private def bm25(idx: Search.Index): Seq[(Long, Double)] =
    Search.searchBm25(spark, idx, Seq("alpha", "beta", "gamma"), 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def ann(idx: VecIndex.Index): Seq[(Long, Double)] =
    VecIndex.ivfTopK(spark, Seq((999L, vec(999))).toDF("id", "vec"),
        idx, nProbe = 4, k = 50)
      .select("nid", "cos")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("sync lifecycle: upsert + delete + restore drains converge to " +
      "a fresh-from-current build for BOTH index kinds (scores " +
      "included); replays and no-op drains fold nothing; watermark " +
      "survives index compaction") {
    val tbl = "target/tmp/idxsync-tbl"
    val sp = "target/tmp/idxsync-search"
    val vp = "target/tmp/idxsync-vec"
    Seq(tbl, sp, vp).foreach(rmDir)
    Versioned.append(rows(1L to 8L), tbl)                    // v1
    // sync-managed indexes bootstrap EMPTY
    Search.writeIndex(rows(Nil).limit(0), "k", "text", sp, nBuckets = 8)
    val sIdx = Search.open(spark, sp)
    val vIdx = VecIndex.init(
      rows(Nil).limit(0).select(col("k").as("id"), col("vec"),
        col("text"), col("lang")),
      32, vp, centroids = Some(cents), cbBuckets = 2)
    def syncBoth(): ((Int, Int), (Int, Int)) =
      (IndexSync.syncSearch(spark, tbl, "k", "text", sIdx),
        IndexSync.syncVector(spark, tbl, "k", "vec", vIdx))
    def assertConverged(tag: String): Unit = {
      assert(bm25(sIdx) == bm25(freshSearch(tbl, s"$sp-ref")),
        s"$tag: BM25 diverges from the fresh build")
      assert(ann(vIdx) == ann(freshVec(tbl, s"$vp-ref")),
        s"$tag: ANN diverges from the fresh build")
    }
    // bootstrap: the whole current state folds as (0, head]
    val ((f1, t1), (fv1, tv1)) = syncBoth()
    assert(f1 == 0 && t1 == 1 && fv1 == 0 && tv1 == 1)
    assertConverged("bootstrap")
    // upsert (rewrites 3,4 with new text+vec) + fresh inserts
    Versioned.append(rows(Seq(3L, 4L), tag = "b"), tbl)      // v2
    Versioned.append(rows(Seq(9L, 10L)), tbl)                // v3
    val ((f2, t2), _) = syncBoth()
    assert(f2 == 1 && t2 == 3)
    assertConverged("upsert")
    // delete (incl. a just-updated key) — pure-delete drain must
    // advance the watermark too
    Versioned.delete(Seq(4L, 7L).toDF("k"), tbl)             // v4
    val ((f3, t3), _) = syncBoth()
    assert(f3 == 3 && t3 == 4)
    assertConverged("delete")
    assert(!bm25(sIdx).exists(r => r._1 == 4L || r._1 == 7L))
    // no-op drain: nothing new — no generations added
    val gensBefore = graft.io.GenLog.metas(spark,
      new org.apache.hadoop.fs.Path(sp).getFileSystem(
        spark.sparkContext.hadoopConfiguration), sp).size
    val ((f4, t4), (fv4, tv4)) = syncBoth()
    assert(f4 == t4 && fv4 == tv4)
    assert(graft.io.GenLog.metas(spark,
      new org.apache.hadoop.fs.Path(sp).getFileSystem(
        spark.sparkContext.hadoopConfiguration), sp).size == gensBefore,
      "a no-op drain must not commit generations")
    // restore: roll the table back past the delete; the sync folds
    // the restore diff (7 and 4 come back at their restored state)
    Versioned.restore(spark, tbl, "k", 3)                    // v5
    syncBoth()
    assertConverged("restore")
    assert(bm25(sIdx).exists(_._1 == 4L) && bm25(sIdx).exists(_._1 == 7L))
    // crash-shaped replay: the tombstone half of a version lands but
    // the append never does — re-syncing converges (re-deleting dead
    // ids is a no-op, the append then lands exactly once)
    Versioned.append(rows(Seq(5L, 6L), tag = "c"), tbl)      // v6
    Search.delete(Seq(5L, 6L).toDF("k"), "k", sIdx) // the "crash" half
    syncBoth()
    assertConverged("torn-sync replay")
    // watermark survives index maintenance: compact+vacuum fold the
    // per-batch markers into the base, the next drain is still a noop
    Search.compact(spark, sIdx)
    Search.vacuum(spark, sIdx)
    VecIndex.compact(spark, vIdx)
    VecIndex.vacuum(spark, vIdx)
    val ((f5, t5), (fv5, tv5)) = syncBoth()
    assert(f5 == t5 && fv5 == tv5,
      "compaction must not reset the sync watermark")
    assertConverged("post-maintenance")
    // MERGE on the table classifies through the full CDC kernel and
    // re-ingests the overlaid key's resolved row
    Versioned.merge(Seq((3L, "alpha omega merged")).toDF("k", "text"),
      tbl)                                                   // v7
    syncBoth()
    assertConverged("merge")
    assert(Search.searchBm25(spark, sIdx, Seq("omega"), 10)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("streaming sync: capped epochs drain a mutating table into a " +
      "continuously-fresh text index (serve == fresh build after " +
      "every drain); a re-run drains nothing; epochs replay " +
      "idempotently across index maintenance") {
    val tbl = "target/tmp/idxsyncstream-tbl"
    val sp = "target/tmp/idxsyncstream-idx"
    val ckpt = "target/tmp/idxsyncstream-ckpt"
    Seq(tbl, sp, ckpt).foreach(rmDir)
    Versioned.append(rows(1L to 8L).drop("vec", "lang"), tbl)  // v1
    Versioned.append(rows(Seq(3L, 4L), tag = "b")
      .drop("vec", "lang"), tbl)                               // v2
    Versioned.delete(Seq(7L).toDF("k"), tbl)                   // v3
    Search.writeIndex(rows(Nil).drop("vec", "lang").limit(0),
      "k", "text", sp, nBuckets = 8)
    val sIdx = Search.open(spark, sp)
    // capped drain: 3 source versions at cap 2 -> 2 epochs, each
    // folding its touched keys
    IndexSync.syncSearchStream(spark, tbl, "k", "text", sIdx, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    def converged(tag: String): Unit =
      assert(bm25(sIdx) == bm25(freshSearch(tbl, s"$sp-ref")),
        s"$tag: streamed index diverges from the fresh build")
    converged("initial drain")
    assert(!bm25(sIdx).exists(_._1 == 7L))
    // idle re-run: no new generations
    val f = new org.apache.hadoop.fs.Path(sp).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val gens = graft.io.GenLog.metas(spark, f, sp).size
    IndexSync.syncSearchStream(spark, tbl, "k", "text", sIdx, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(graft.io.GenLog.metas(spark, f, sp).size == gens,
      "an idle re-run must not commit generations")
    // more DML + index maintenance between drains; the resumed
    // stream folds only the new versions and the marker survives
    Versioned.append(rows(Seq(9L), tag = "c").drop("vec", "lang"),
      tbl)                                                     // v4
    Versioned.delete(Seq(2L).toDF("k"), tbl)                   // v5
    Search.compact(spark, sIdx)
    Search.vacuum(spark, sIdx)
    IndexSync.syncSearchStream(spark, tbl, "k", "text", sIdx, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    converged("post-maintenance resume")
    assert(bm25(sIdx).exists(_._1 == 9L) &&
      !bm25(sIdx).exists(_._1 == 2L))
    // crash-shaped replay: tombstone half of the NEXT epoch lands
    // out of band, then the stream drains — still converges
    Versioned.append(rows(Seq(5L), tag = "d").drop("vec", "lang"),
      tbl)                                                     // v6
    Search.delete(Seq(5L).toDF("k"), "k", sIdx)
    IndexSync.syncSearchStream(spark, tbl, "k", "text", sIdx, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    converged("torn-epoch replay")
    // VECTOR streaming sync: same contract, VecIndex target
    val vtbl = "target/tmp/idxsyncstream-vtbl"
    val vp = "target/tmp/idxsyncstream-vidx"
    val vckpt = "target/tmp/idxsyncstream-vckpt"
    Seq(vtbl, vp, vckpt).foreach(rmDir)
    Versioned.append(rows(1L to 8L).select("k", "vec", "lang"), vtbl)
    Versioned.append(rows(Seq(3L), tag = "b")
      .select("k", "vec", "lang"), vtbl)
    Versioned.delete(Seq(6L).toDF("k"), vtbl)
    val vIdx = VecIndex.init(
      rows(Nil).limit(0).select(col("k").as("id"), col("vec"),
        col("lang")),
      32, vp, centroids = Some(cents), cbBuckets = 2)
    IndexSync.syncVectorStream(spark, vtbl, "k", "vec", vIdx, vckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(ann(vIdx) == ann(freshVec(vtbl, s"$vp-ref")),
      "streamed vector index diverges from the fresh build")
    assert(!ann(vIdx).exists(_._1 == 6L))
  }

  test("out-of-band indexes refuse; null payloads are absent; a row " +
      "losing its payload on update is tombstoned without re-ingest") {
    val tbl = "target/tmp/idxsync-edge-tbl"
    val sp = "target/tmp/idxsync-edge-search"
    Seq(tbl, sp).foreach(rmDir)
    Versioned.append(
      Seq((1L, "alpha one"), (2L, null.asInstanceOf[String]),
        (3L, "alpha three")).toDF("k", "text"), tbl)         // v1
    // non-empty index with no watermark: built out of band -> loud
    Search.writeIndex(Seq((9L, "stray")).toDF("k", "text"),
      "k", "text", sp)
    val e = intercept[IllegalArgumentException] {
      IndexSync.syncSearch(spark, tbl, "k", "text",
        Search.open(spark, sp))
    }
    assert(e.getMessage.contains("out of band"))
    // sync-managed from empty: the null-text row is absent
    rmDir(sp)
    Search.writeIndex(Seq.empty[(Long, String)].toDF("k", "text"),
      "k", "text", sp, nBuckets = 8)
    val sIdx = Search.open(spark, sp)
    IndexSync.syncSearch(spark, tbl, "k", "text", sIdx)
    assert(Search.searchBm25(spark, sIdx, Seq("alpha"), 10)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // an update that NULLS the payload tombstones without re-ingest
    Versioned.append(Seq((1L, null.asInstanceOf[String]))
      .toDF("k", "text"), tbl)                               // v2
    IndexSync.syncSearch(spark, tbl, "k", "text", sIdx)
    assert(Search.searchBm25(spark, sIdx, Seq("alpha"), 10)
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }
}
