package graft.io

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String = {
    val p = s"target/tmp/vspec-$tag"
    Versioned.drop(spark, p)
    p
  }

  test("append + asOf time travel + latestVersion") {
    val p = freshPath("tt")
    assert(Versioned.latestVersion(spark, p) == 0)
    assert(Versioned.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), p) == 1)
    assert(Versioned.append(Seq((3L, "c")).toDF("k", "s"), p) == 2)
    assert(Versioned.latestVersion(spark, p) == 2)
    assert(Versioned.asOf(spark, p, 1).count() == 2L)
    assert(Versioned.asOf(spark, p, 2).count() == 3L)
    // the log view carries the version stamp
    assert(Versioned.asOf(spark, p, 2)
      .filter(col(Versioned.VersionCol) === 2).count() == 1L)
  }

  test("merge-on-read: upsert wins, tombstone deletes, as-of resolves per version") {
    val p = freshPath("mor")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p) // upsert k=2
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)    // delete k=3
    def cur(v: Int) = Versioned.currentAsOf(spark, p, "k", v)
      .select("k", "x").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur(1) == Map(1L -> 10, 2L -> 20, 3L -> 30))
    assert(cur(2) == Map(1L -> 10, 2L -> 99, 3L -> 30))
    assert(cur(3) == Map(1L -> 10, 2L -> 99))
  }

  test("schema evolution inside the log: later version adds a column") {
    val p = freshPath("evo")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 20, "fresh")).toDF("k", "x", "tag"), p)
    val cur = Versioned.current(spark, p, "k")
      .select(col("k"), col("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(cur == Map(1L -> None, 2L -> Some("fresh")))
  }

  test("restore: roll-forward to an old version unwinds later commits, " +
      "keeps all history time-travelable, and the table stays writable") {
    val p = freshPath("restore")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99), (4L, 40)).toDF("k", "x"), p) // upsert+insert
    Versioned.delete(Seq(Tuple1(1L)).toDF("k"), p)              // delete k=1
    def cur() = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur() == Map(2L -> 99, 3L -> 30, 4L -> 40))
    // restore to v1: upsert/insert/delete all unwound
    val v = Versioned.restore(spark, p, "k", 1)
    assert(v == 4)
    assert(cur() == Map(1L -> 10, 2L -> 20, 3L -> 30))
    // pre-restore history is untouched: every old version still resolves
    assert(Versioned.currentAsOf(spark, p, "k", 2)
      .select("k", "x").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      == Map(1L -> 10, 2L -> 99, 3L -> 30, 4L -> 40))
    assert(Versioned.currentAsOf(spark, p, "k", 3)
      .select("k").collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    // the restore is an ORDINARY diff commit, so CDC sees exactly it:
    // k=1 re-created, k=2 rolled back, k=4 deleted — k=3 (identical in
    // both states) emits nothing
    val cdc = Versioned.changes(spark, p, "k", 3, 4)
      .select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cdc == Map(1L -> "insert", 2L -> "update", 4L -> "delete"))
    // and the SCD2 history agrees with current (a checkpoint-shaped
    // restore would be invisible here)
    val hcur = Versioned.history(spark, p, "k")
      .filter(col("is_current")).select("k", "x").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hcur == cur())
    // and the table keeps accepting commits on top of the restore
    Versioned.append(Seq((5L, 50)).toDF("k", "x"), p)
    assert(cur() == Map(1L -> 10, 2L -> 20, 3L -> 30, 5L -> 50))
    // restoring below the vacuum base fails loudly
    Versioned.compact(spark, p, "k")
    Versioned.vacuum(spark, p, 0)
    val e = intercept[IllegalArgumentException] {
      Versioned.restore(spark, p, "k", 2)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("deleteWhere tombstones exactly the matching current keys; " +
      "detail reports one metadata row per version") {
    val p = freshPath("delw")
    Versioned.append(Seq((1L, 10), (2L, 200), (3L, 300)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 20)).toDF("k", "x"), p) // 2 now BELOW cut
    val v = Versioned.deleteWhere(spark, p, "k", col("x") >= 100)
    assert(v == 3)
    assert(Versioned.current(spark, p, "k")
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // predicate judged on RESOLVED state: k=2's upserted x=20 survives
    // nothing matching -> no commit burned
    assert(Versioned.deleteWhere(spark, p, "k", col("x") >= 100) == 0)
    assert(Versioned.latestVersion(spark, p) == 3)
    // detail: one row per version, metadata only
    Versioned.compact(spark, p, "k")
    val d = Versioned.detail(spark, p).collect()
      .map(r => r.getInt(0) -> ((r.getBoolean(2), r.getInt(6)))).toMap
    assert(d.keySet == Set(1, 2, 3, 4))
    assert(d(4)._1 && !d(1)._1) // checkpoint flag
    assert(d.values.forall(_._2 >= 1)) // every version has files
    val ts = Versioned.detail(spark, p).select("commit_ts_millis")
      .collect().map(_.getLong(0))
    assert(ts.forall(_ > 0L))
  }

  test("compact: checkpointed read equals pre-compact state; time travel intact") {
    val p = freshPath("cp")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)
    val before = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val cpV = Versioned.compact(spark, p, "k")
    assert(cpV == 4)
    val after = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == before)
    // the checkpointed read touches ONLY the checkpoint version
    assert(Versioned.current(spark, p, "k")
      .select(Versioned.VersionCol).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    // history unbroken: as-of BELOW the checkpoint still resolves
    assert(Versioned.currentAsOf(spark, p, "k", 2)
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 10), (2L, 99), (3L, 30)))
  }

  test("changes: insert/update/delete between resolved versions, none suppressed") {
    val p = freshPath("cdc")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)  // update k=2
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)     // delete k=3
    Versioned.append(Seq((4L, 40)).toDF("k", "x"), p)  // insert k=4
    val got = Versioned.changes(spark, p, "k", 1, 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=1 unchanged -> absent
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    // re-inserting the same value is NOT a change between those versions
    assert(Versioned.changes(spark, p, "k", 2, 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(3L -> "delete", 4L -> "insert"))
  }

  test("appendBatch: re-delivered micro-batches commit exactly once") {
    val p = freshPath("batch")
    assert(Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p, 0L) == 1)
    // same batchId re-delivered (streaming restart): no new version
    assert(Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p, 0L) == 1)
    assert(Versioned.appendBatch(Seq((2L, 20)).toDF("k", "x"), p, 1L) == 2)
    assert(Versioned.latestVersion(spark, p) == 2)
    assert(Versioned.current(spark, p, "k").count() == 2L)
  }

  test("appendBatch ingest scoping: a NEW ingest's batch 0 commits " +
      "against a table an old ingest fed (fresh checkpoints restart " +
      "batch ids at 0); per-scope replays stay idempotent") {
    val p = freshPath("batchscope")
    Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p, 0L, "ckptA")
    Versioned.appendBatch(Seq((2L, 20)).toDF("k", "x"), p, 1L, "ckptA")
    // the data-loss shape: a new checkpoint's batch 0 against the same
    // table — a global marker would read it as ckptA's replay and drop
    val v = Versioned.appendBatch(Seq((3L, 30)).toDF("k", "x"), p,
      0L, "ckptB")
    assert(v == 3, "new ingest's batch 0 was swallowed")
    assert(Versioned.current(spark, p, "k").count() == 3L)
    // each scope replay-guards independently
    assert(Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p,
      0L, "ckptA") == 1)
    assert(Versioned.appendBatch(Seq((3L, 30)).toDF("k", "x"), p,
      0L, "ckptB") == 3)
    assert(Versioned.latestVersion(spark, p) == 3)
    // scoped markers never pollute the maintained-view lineage parse
    // (integer-only _BATCH_<n>): no unscoped batch exists here
    assert(Versioned.batchMarkerMax(spark, p) == 0)
  }

  test("streaming ingest via foreachBatch lands every row exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val p = freshPath("stream")
    val stream = MemoryStream[(Long, Int)]
    val query = stream.toDS().toDF("k", "x").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Versioned.appendBatch(b, p, id); ()
      }
      .start()
    try {
      stream.addData((1L, 10), (2L, 20))
      query.processAllAvailable()
      stream.addData((3L, 30))
      query.processAllAvailable()
    } finally query.stop()
    val got = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 10), (2L, 20), (3L, 30)))
    assert(Versioned.latestVersion(spark, p) == 2)
  }

  test("asOf is the log view: counts invariant under compact, checkpoints excluded") {
    val p = freshPath("asofcp")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)
    val before = (1 to 3).map(v => Versioned.asOf(spark, p, v).count())
    Versioned.compact(spark, p, "k") // v4 checkpoint
    // the log view at every pre-compact version is unchanged — the
    // checkpoint's materialized copies never double-count
    assert((1 to 3).map(v => Versioned.asOf(spark, p, v).count()) == before)
    // at the checkpoint version itself the log still holds 5 rows
    // (3 appends + 1 upsert + 1 tombstone), not 5 + |resolved|
    assert(Versioned.asOf(spark, p, 4).count() == 5L)
    // a post-compact append shows up exactly once
    Versioned.append(Seq((9L, 90)).toDF("k", "x"), p)
    assert(Versioned.asOf(spark, p, 5).count() == 6L)
  }

  test("vacuum: reads inside the horizon survive, below the base fail loudly") {
    val p = freshPath("vac")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p) // v1
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)                     // v2
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)                        // v3
    Versioned.compact(spark, p, "k")                                      // v4 ckpt
    Versioned.append(Seq((4L, 40)).toDF("k", "x"), p)                     // v5
    Versioned.append(Seq((5L, 50)).toDF("k", "x"), p)                     // v6
    val curBefore = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // horizon 2: base = newest checkpoint <= 6-2=4 → v4; v1..v3 reclaimed
    assert(Versioned.vacuum(spark, p, 2) == Seq(1, 2, 3))
    assert(Versioned.versions(spark, p) == Seq(4, 5, 6))
    // resolved reads at/above the base are intact
    assert(Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      == curBefore)
    assert(Versioned.currentAsOf(spark, p, "k", 5)
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      == curBefore - ((5L, 50)))
    // the log view inside the horizon: base checkpoint stands in for
    // the reclaimed prefix (2 resolved rows) + v5 + v6
    assert(Versioned.asOf(spark, p, 6).count() == 4L)
    // below the base: loud failure, never a silent partial read
    val e1 = intercept[IllegalArgumentException](
      Versioned.asOf(spark, p, 3).count())
    assert(e1.getMessage.contains("vacuum"))
    val e2 = intercept[IllegalArgumentException](
      Versioned.currentAsOf(spark, p, "k", 3).count())
    assert(e2.getMessage.contains("vacuum"))
    // idempotent: nothing else old enough
    assert(Versioned.vacuum(spark, p, 2) == Nil)
  }

  test("vacuum bounds the version-dir count across append/compact cycles") {
    val p = freshPath("vacbound")
    for (round <- 1 to 4) {
      Versioned.append(Seq((round.toLong, round)).toDF("k", "x"), p)
      Versioned.append(Seq((round.toLong + 100, round)).toDF("k", "x"), p)
      Versioned.compact(spark, p, "k")
      Versioned.vacuum(spark, p, 1)
    }
    // 4 cycles x 3 commits = 12 versions written; retention keeps the
    // listing bounded (newest checkpoint + the tail inside the horizon)
    assert(Versioned.versions(spark, p).size <= 4)
    assert(Versioned.current(spark, p, "k").count() == 8L)
  }

  test("appendBatch marker is atomic with visibility; staging leftovers invisible") {
    val p = freshPath("atomic")
    val v = Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p, 7L)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the committed dir holds BOTH _SUCCESS and the batch marker — they
    // were staged together and published by one rename, so no crash
    // point separates them
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p/v=$v/_SUCCESS")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p/v=$v/_BATCH_7")))
    // a crashed commit = an orphaned staging dir: invisible to readers
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/.staging-v=2-deadbeef"))
    assert(Versioned.versions(spark, p) == Seq(1))
    assert(Versioned.current(spark, p, "k").count() == 1L)
    // re-delivery after the "crash" commits the batch exactly once
    assert(Versioned.appendBatch(Seq((2L, 20)).toDF("k", "x"), p, 8L) == 2)
    assert(Versioned.appendBatch(Seq((2L, 20)).toDF("k", "x"), p, 8L) == 2)
    assert(Versioned.current(spark, p, "k").count() == 2L)
  }

  test("vacuum sweeps AGED pending-colmap orphans (crashed writers) " +
      "like stale claims; a fresh declaration survives the sweep") {
    val p = freshPath("pcolsweep")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed writer's orphan: marker declared, writer gone, aged
    // past the 1h guard
    Versioned.writePendingColmap(spark, p, 9, Some(Seq(("k", "k"))))
    val orphan = new org.apache.hadoop.fs.Path(p, ".pending-colmap-v=9")
    fs.setTimes(orphan, System.currentTimeMillis() - 2 * 3600 * 1000L, -1)
    // an in-flight writer's FRESH declaration must survive
    Versioned.writePendingColmap(spark, p, 10, Some(Seq(("k", "k"))))
    Versioned.vacuum(spark, p, 1000) // horizon huge: no version reclaim
    assert(!fs.exists(orphan), "aged pending-colmap orphan not swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      p, ".pending-colmap-v=10")), "fresh declaration must survive")
    Versioned.deletePendingColmap(spark, p, 10)
  }

  test("duplicate key within one commit resolves deterministically across reads") {
    val p = freshPath("dupkey")
    // contract violation (two rows, same key, same commit): the resolve
    // must still pick ONE row and the SAME row on every read
    Versioned.append(Seq((1L, 10), (1L, 20)).toDF("k", "x"), p)
    val first = Versioned.current(spark, p, "k").select("k", "x").collect()
    assert(first.length == 1)
    (1 to 3).foreach { _ =>
      assert(Versioned.current(spark, p, "k").select("k", "x").collect()
        .sameElements(first))
    }
  }

  test("merge: per-column upsert, insert-when-missing, superseded by later append") {
    val p = freshPath("merge")
    Versioned.append(
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "x"), p)
    // column-level update: x changes, s (null in the update) is kept
    Versioned.merge(Seq((1L, Option.empty[String], Some(99)))
      .toDF("k", "s", "x"), p)
    // merge on an absent key = insert
    Versioned.merge(Seq((7L, Some("new"), Option.empty[Int]))
      .toDF("k", "s", "x"), p)
    def cur = Versioned.current(spark, p, "k")
      .select("k", "s", "x").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(cur == Map(
      1L -> ((Some("a"), Some(99))),   // s kept, x updated
      2L -> ((Some("b"), Some(20))),   // untouched
      3L -> ((Some("c"), Some(30))),   // untouched
      7L -> ((Some("new"), None))))    // inserted by merge
    // a later FULL append replaces the whole row (earlier merges die)
    Versioned.append(Seq((1L, Option.empty[String], Some(5)))
      .toDF("k", "s", "x"), p)
    assert(cur(1L) == ((None, Some(5))))
    // merge stacking: newest non-null per column wins
    Versioned.merge(Seq((2L, Some("B2"), Option.empty[Int]))
      .toDF("k", "s", "x"), p)
    Versioned.merge(Seq((2L, Option.empty[String], Some(22)))
      .toDF("k", "s", "x"), p)
    assert(cur(2L) == ((Some("B2"), Some(22))))
  }

  test("merge after delete inserts; compact materializes merged state") {
    val p = freshPath("mergedel")
    Versioned.append(Seq((1L, 10), (2L, 20)).toDF("k", "x"), p)
    Versioned.delete(Seq(Tuple1(2L)).toDF("k"), p)
    Versioned.merge(Seq((2L, 200)).toDF("k", "x"), p) // resurrects k=2
    def cur = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val before = cur
    assert(before == Set((1L, 10), (2L, 200)))
    // compaction folds merges into full rows; resolve is unchanged and
    // takes the fast (merge-free) path from the checkpoint on
    Versioned.compact(spark, p, "k")
    assert(cur == before)
    // ...and a merge after the checkpoint still applies
    Versioned.merge(Seq((1L, 11)).toDF("k", "x"), p)
    assert(cur == Set((1L, 11), (2L, 200)))
  }

  test("currentAsOfRange prunes files by footer zone maps, same answer") {
    val p = freshPath("zone")
    val wide = spark.range(0, 4000).select(col("id").as("k"),
      (col("id") % 97).as("x"))
    // range-partitioned write → each file covers a disjoint key slice
    Versioned.append(wide.repartitionByRange(8, col("k")), p)
    Versioned.append(Seq((17L, 999L)).toDF("k", "x"), p) // upsert inside range
    val full = Versioned.current(spark, p, "k")
    val pruned = Versioned.currentAsOfRange(spark, p, "k", 2, 10L, 40L)
    val expect = full.filter(col("k").between(10, 40))
      .select("k", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(expect((17L, 999L)))
    // the zone maps dropped most of the 8 range files
    assert(pruned.inputFiles.length < full.inputFiles.length)
    assert(pruned.inputFiles.length <= 3)
  }

  test("asOfRange: pruned log view equals brute filter, checkpoints excluded") {
    val p = freshPath("asofrange")
    val df = spark.range(0, 2000).select(col("id").as("k"),
      (col("id") % 7).as("x"))
    Versioned.append(df.repartitionByRange(8, col("k")), p)
    Versioned.append(Seq((5L, 77L)).toDF("k", "x"), p)
    Versioned.compact(spark, p, "k") // must not double-count in the log view
    val got = Versioned.asOfRange(spark, p, 3, "k", 100L, 200L)
      .select("k").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == (100L to 200L).toSeq) // log rows, no checkpoint dupes
    val full = Versioned.asOf(spark, p, 3)
    assert(Versioned.asOfRange(spark, p, 3, "k", 100L, 200L)
      .inputFiles.length < full.inputFiles.length)
  }

  test("changes sees through MERGE commits: column update surfaces as 'update'") {
    val p = freshPath("cdcmerge")
    Versioned.append(Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "x"), p)
    Versioned.merge(Seq((1L, Option.empty[String], Some(99)))
      .toDF("k", "s", "x"), p)           // x updated, s kept
    Versioned.merge(Seq((3L, Some("c"), Option.empty[Int]))
      .toDF("k", "s", "x"), p)           // insert-by-merge
    val got = Versioned.changes(spark, p, "k", 1, 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "update", 3L -> "insert"))
  }

  test("timestamp time travel: versionAt picks the newest commit at or before ts") {
    val p = freshPath("tstravel")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    Versioned.append(Seq((1L, 99)).toDF("k", "x"), p)
    val times = Versioned.commitTimes(spark, p)
    assert(times.keySet == Set(1, 2) && times(1) < times(2))
    assert(Versioned.versionAt(spark, p, between) == 1)
    assert(Versioned.versionAt(spark, p, System.currentTimeMillis()) == 2)
    assert(Versioned.currentAtTime(spark, p, "k", between)
      .select("x").head().getInt(0) == 10)
    // before any commit: loud failure
    intercept[IllegalArgumentException](
      Versioned.versionAt(spark, p, times(1) - 1000))
  }

  test("compactZOrder: snapshot scans skip files on every clustered column") {
    val p = freshPath("zorder")
    val n = 4096L
    // x decorrelated from k (multiplicative shuffle) so a single-column
    // sort could not make BOTH footer ranges tight
    val df = spark.range(n).select(col("id").as("k"),
      ((col("id") * 2654435761L) % n).as("x"))
    Versioned.append(df.repartitionByRange(8, col("k")), p)
    // upsert stays inside the x domain: linear bucket scaling means ONE
    // wild outlier would stretch the scale and collapse all normal
    // values into bucket 0 (the documented linear-vs-equi-depth trade)
    Versioned.append(Seq((17L, 4000L)).toDF("k", "x"), p)
    val cp = Versioned.compactZOrder(spark, p, "k", Seq("k", "x"), nFiles = 32)
    val all = Versioned.current(spark, p, "k")
    assert(all.inputFiles.length > 8, "fixture: checkpoint should be many files")
    val expect = all.filter(col("x").between(0, 255))
      .select("k", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // predicate on x — NOT the resolve key, NOT the leading sort column
    val zx = Versioned.snapshotRange(spark, p, cp, "x", 0L, 255L)
    assert(zx.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(expect.nonEmpty)
    assert(zx.inputFiles.length < all.inputFiles.length / 2,
      s"x-scan read ${zx.inputFiles.length} of ${all.inputFiles.length} files")
    // ...and on k, simultaneously
    val zk = Versioned.snapshotRange(spark, p, cp, "k", 0L, 255L)
    assert(zk.inputFiles.length < all.inputFiles.length / 2)
    assert(zk.select("k").collect().map(_.getLong(0)).toSet ==
      all.filter(col("k") <= 255).select("k").collect().map(_.getLong(0)).toSet)
    // the upsert inside the range is the checkpointed (resolved) value
    assert(zk.filter(col("k") === 17L).select("x").head().getLong(0) == 4000L)
  }

  test("incremental folds preserve Z-order clustering: the _ZCOLS " +
      "marker re-applies the interleaved sort to rewritten files, so " +
      "non-key skipping survives repeated folds") {
    val p = freshPath("zorderinc")
    val n = 4096L
    val df = spark.range(n).select(col("id").as("k"),
      ((col("id") * 2654435761L) % n).as("x"))
    Versioned.append(df.repartitionByRange(8, col("k")), p)
    val cp = Versioned.compactZOrder(spark, p, "k", Seq("k", "x"),
      nFiles = 32)
    assert(Versioned.zcolsAt(spark, p, cp) == Seq("k", "x"))
    // three fold cycles, each a narrow-key-band delta (the continuous
    // ingest shape) — every fold rewrites some clustered files
    (0 until 3).foreach { i =>
      val lo = i * 500L
      Versioned.append(
        spark.range(lo, lo + 200).select(col("id").as("k"),
          ((col("id") * 2654435761L) % n).as("x")),
        p)
      Versioned.compactIncremental(spark, p, "k")
    }
    val head = Versioned.latestVersion(spark, p)
    assert(Versioned.checkpoints(spark, p).contains(head))
    // the clustering marker carried through every fold
    assert(Versioned.zcolsAt(spark, p, head) == Seq("k", "x"))
    val all = Versioned.current(spark, p, "k")
    val expect = all.filter(col("x").between(0, 255))
      .select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    // non-key x-skipping still bites on the POST-FOLD checkpoint —
    // a key-only rewrite would have decayed x selectivity in every
    // rewritten file
    val zx = Versioned.snapshotRange(spark, p, head, "x", 0L, 255L)
    assert(zx.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(zx.inputFiles.length < all.inputFiles.length / 2,
      s"x-scan read ${zx.inputFiles.length} of " +
        s"${all.inputFiles.length} files after folds")
    // key skipping holds too
    val zk = Versioned.snapshotRange(spark, p, head, "k", 0L, 255L)
    assert(zk.inputFiles.length < all.inputFiles.length / 2)
    assert(zk.select("k").collect().map(_.getLong(0)).toSet ==
      all.filter(col("k") <= 255).select("k").collect()
        .map(_.getLong(0)).toSet)
  }

  test("string zone pruning compares in unsigned UTF-8 byte order: a " +
      "key between U+E000 and a supplementary-plane max is never " +
      "silently pruned (UTF-16 order would skip its file)") {
    val p = freshPath("utf8zone")
    val supp = new String(Character.toChars(0x10000)) // U+10000
    // one file whose footer min/max (UTF-8 order) bracket the probe:
    // min = a (EE 80 80 ...), max = U+10000b (F0 90 80 80 ...).
    // In Java UTF-16 order the max starts with a SURROGATE (D800) <
    // , so a UTF-16 compare concludes lo > max and prunes the
    // file — losing the row.
    Versioned.append(Seq(("a", 1L), ("", 2L),
      (supp + "b", 3L)).toDF("k", "x").coalesce(1), p)
    val ranged = Versioned.currentRange(spark, p, "k",
      "", "")
    assert(ranged.select("x").as[Long].collect().toSeq == Seq(2L),
      "range read lost the row to UTF-16-order pruning")
    val pt = Versioned.currentPoint(spark, p, "k", "")
    assert(pt.select("x").as[Long].collect().toSeq == Seq(2L),
      "point lookup lost the row to UTF-16-order pruning")
    // and pruning still prunes: a probe ABOVE the supplementary max
    // (UTF-8: F4 ... > F0 ...) reads nothing
    assert(Versioned.currentRange(spark, p, "k",
      new String(Character.toChars(0x10FFFF)),
      new String(Character.toChars(0x10FFFF))).count() == 0)
  }

  test("compactZOrderQuantile: skipping survives the outlier that " +
      "collapses linear bucketing") {
    val p = freshPath("zorderq")
    val n = 4096L
    val df = spark.range(n).select(col("id").as("k"),
      ((col("id") * 2654435761L) % n).as("x"))
    Versioned.append(df.repartitionByRange(8, col("k")), p)
    // a single wild outlier: under LINEAR scaling every normal x value
    // lands in bucket 0 (range 0..1e12), so x-files all cover the whole
    // normal domain; equi-depth cuts ignore the outlier's magnitude
    Versioned.append(Seq((17L, 1000000000000L)).toDF("k", "x"), p)
    val cpLin = Versioned.compactZOrder(spark, p, "k", Seq("k", "x"),
      nFiles = 32)
    val cpEq = Versioned.compactZOrderQuantile(spark, p, "k", Seq("k", "x"),
      nFiles = 32)
    val all = Versioned.current(spark, p, "k")
    val expect = all.filter(col("x").between(0, 255))
      .select("k", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    val linScan = Versioned.snapshotRange(spark, p, cpLin, "x", 0L, 255L)
    val eqScan = Versioned.snapshotRange(spark, p, cpEq, "x", 0L, 255L)
    // both return exactly the right rows...
    assert(eqScan.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(linScan.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    // ...but the linear layout degenerates (x-bucket 0 for all normal
    // rows -> x footer ranges useless) while equi-depth keeps skipping
    val linFiles = linScan.inputFiles.length
    val eqFiles = eqScan.inputFiles.length
    assert(eqFiles < linFiles,
      s"equi-depth read $eqFiles files, linear $linFiles (of 32)")
    assert(eqFiles <= 32 / 2, s"equi-depth read $eqFiles of 32 files")
    // key skipping still works on the equi-depth checkpoint too
    val zk = Versioned.snapshotRange(spark, p, cpEq, "k", 0L, 255L)
    assert(zk.select("k").collect().map(_.getLong(0)).toSet ==
      all.filter(col("k") <= 255).select("k").collect().map(_.getLong(0)).toSet)
  }

  test("logStream: committed versions arrive exactly once, checkpoints excluded") {
    val p = freshPath("logstream")
    Versioned.append(Seq((1L, 10), (2L, 20)).toDF("k", "x"), p)
    val q = Versioned.logStream(spark, p)
      .writeStream.format("memory").queryName("vlog")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def got = spark.table("vlog")
        .select("k", "x", Versioned.VersionCol).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == Set((1L, 10, 1), (2L, 20, 1)))
      // new commits stream in as their dirs appear; the checkpoint's
      // materialized copies do NOT re-deliver
      Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)
      Versioned.compact(spark, p, "k")
      Versioned.append(Seq((3L, 30)).toDF("k", "x"), p)
      q.processAllAvailable()
      assert(got == Set((1L, 10, 1), (2L, 20, 1), (2L, 99, 2), (3L, 30, 4)))
    } finally q.stop()
  }

  test("streaming loop: ingest sink and log source compose end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val p = freshPath("loop")
    // seed version fixes the log-stream schema
    Versioned.append(Seq((0L, 0)).toDF("k", "x"), p)
    val in = MemoryStream[(Long, Int)]
    val ingest = in.toDS().toDF("k", "x").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Versioned.appendBatch(b, p, id); ()
      }
      .start()
    val out = Versioned.logStream(spark, p)
      .writeStream.format("memory").queryName("vloop")
      .outputMode("append").start()
    try {
      in.addData((1L, 10), (2L, 20))
      ingest.processAllAvailable()
      out.processAllAvailable()
      in.addData((3L, 30))
      ingest.processAllAvailable()
      out.processAllAvailable()
      val got = spark.table("vloop").select("k", "x").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == Set((0L, 0), (1L, 10), (2L, 20), (3L, 30)))
    } finally { ingest.stop(); out.stop() }
  }

  test("a torn write (no _SUCCESS) is invisible and its slot is reclaimed") {
    val p = freshPath("torn")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    // simulate a torn commit: directory exists, no _SUCCESS marker
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/v=2"))
    assert(Versioned.versions(spark, p) == Seq(1))
    assert(Versioned.latestVersion(spark, p) == 1)
    // the next commit reclaims v=2 and is fully visible
    assert(Versioned.append(Seq((2L, 20)).toDF("k", "x"), p) == 2)
    assert(Versioned.current(spark, p, "k").count() == 2L)
  }

  test("history: SCD2 intervals, tombstone closes, invariant under compact") {
    val p = freshPath("hist")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p) // upsert k=2
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)    // delete k=3
    def hist() = Versioned.history(spark, p, "k")
      .select("k", "x", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4)))
      .toSet
    val expected = Set(
      (1L, 10, 1, -1, true),  // never touched: open interval
      (2L, 20, 1, 1, false),  // superseded by the v2 upsert
      (2L, 99, 2, -1, true),
      (3L, 30, 1, 2, false))  // tombstoned at v3: closed, no v3 row
    assert(hist() == expected)
    // checkpoints are materialized copies, not history events
    Versioned.compact(spark, p, "k")
    assert(hist() == expected)
    // MERGE commits have no self-contained state to open an interval
    Versioned.merge(Seq((1L, 77)).toDF("k", "x"), p)
    assertThrows[IllegalArgumentException](Versioned.history(spark, p, "k"))
  }

  test("concurrent writers: claim-file CAS gives every commit a distinct " +
      "version, no torn state") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val p = freshPath("mw")
    Versioned.append(Seq((999L, -1)).toDF("k", "x"), p) // seed v=1
    val writers = 4
    val roundsPer = 3
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try (0 until roundsPer).foreach { r =>
            got.add(Versioned.append(
              Seq((w * 100L + r, w)).toDF("k", "x"), p))
          } catch { case t: Throwable => errs.add(t) }
        }
      })
    }
    start.countDown() // fire all writers at once
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
    val vs = got.iterator().asScala.toSeq
    assert(vs.size == writers * roundsPer)
    assert(vs.distinct.size == vs.size,
      s"version collision among $vs") // every commit a distinct slot
    // all committed versions are listed and fully readable
    assert(Versioned.versions(spark, p).size == writers * roundsPer + 1)
    val resolved = Versioned.current(spark, p, "k")
    assert(resolved.count() == writers * roundsPer + 1L)
    // no stray visible garbage: only v= dirs and hidden claims/staging
    val root = new java.io.File(p)
    assert(root.listFiles().forall(d =>
      d.getName.startsWith("v=") || d.getName.startsWith(".")))
  }

  test("appendChecked: CHECK expectations gate the commit — violations " +
      "fail loudly with counts, table untouched, no slot burned") {
    val p = freshPath("check")
    val good = Seq((1L, 10, "en"), (2L, 20, "de")).toDF("k", "x", "lang")
    val checks = Seq(
      "x_positive" -> (col("x") > 0),
      "lang_known" -> col("lang").isin("en", "de", "fr"))
    assert(Versioned.appendChecked(good, p, checks) == 1)
    // violating batch: 2 rows fail x_positive, 1 fails lang_known
    val bad = Seq((3L, -1, "en"), (4L, 0, "xx"), (5L, 7, "de"))
      .toDF("k", "x", "lang")
    val e = intercept[IllegalArgumentException](
      Versioned.appendChecked(bad, p, checks))
    assert(e.getMessage.contains("x_positive: 2 rows"))
    assert(e.getMessage.contains("lang_known: 1 row"))
    assert(Versioned.latestVersion(spark, p) == 1, "nothing committed")
    // no claim-slot leak: the next good commit takes version 2
    assert(Versioned.appendChecked(
      Seq((6L, 1, "fr")).toDF("k", "x", "lang"), p, checks) == 2)
    // SQL CHECK null semantics: NULL passes; isNotNull makes it fail
    val withNull = Seq((7L, 5, null.asInstanceOf[String]))
      .toDF("k", "x", "lang")
    assert(Versioned.appendChecked(withNull, p,
      Seq("lang_known" -> col("lang").isin("en", "de", "fr"))) == 3)
    assertThrows[IllegalArgumentException](Versioned.appendChecked(
      Seq((8L, 5, null.asInstanceOf[String])).toDF("k", "x", "lang"), p,
      Seq("lang_present" -> col("lang").isNotNull)))
  }

  test("appendCheckedQuarantine: violating rows divert to the dead-" +
      "letter table with reasons, clean rows land, replay is exactly-" +
      "once on BOTH sides, a partial crash heals") {
    val p = freshPath("quar-main")
    val q = freshPath("quar-dead")
    val checks = Seq(
      "x_positive" -> (col("x") > 0),
      "lang_known" -> col("lang").isin("en", "de", "fr"))
    // 2 clean rows; k=3 fails one check, k=4 fails BOTH
    val batch = Seq((1L, 10, "en"), (2L, 20, "de"),
      (3L, -1, "en"), (4L, 0, "xx")).toDF("k", "x", "lang")
    val (mv, qv) = Versioned.appendCheckedQuarantine(
      batch, p, checks, q, batchId = 7L, ingestId = "ing")
    assert(mv.contains(1) && qv.contains(1))
    assert(Versioned.current(spark, p, "k").select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val deadRows = Versioned.current(spark, q, "k")
      .select("k", "q_violated").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(deadRows == Map(3L -> "x_positive",
      4L -> "x_positive,lang_known"))
    // counts ride as a stats marker in BOTH commits
    val fsys = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(p, q).foreach { t =>
      assert(fsys.exists(new org.apache.hadoop.fs.Path(
        s"$t/v=1/_CHECKS_clean-2_bad-2")), s"stats marker missing at $t")
    }
    // REPLAY: both sides must be a no-op (same versions returned)
    assert(Versioned.appendCheckedQuarantine(batch, p, checks, q,
      7L, "ing") == ((Some(1), Some(1))))
    assert(Versioned.latestVersion(spark, p) == 1 &&
      Versioned.latestVersion(spark, q) == 1)
    // PARTIAL-CRASH replay: batch 8's quarantine side "already
    // committed" (the crash point is between the two commits) — the
    // retry must skip it and land only the clean slice
    val b8 = Seq((5L, 5, "fr"), (6L, -6, "de")).toDF("k", "x", "lang")
    Versioned.appendBatch(b8.filter(col("x") <= 0)
      .withColumn("q_violated", lit("x_positive"))
      .withColumn("q_batch", lit(8L)), q, 8L, "ing")
    val (mv8, qv8) = Versioned.appendCheckedQuarantine(
      b8, p, checks, q, 8L, "ing")
    assert(mv8.contains(2) && qv8.contains(2))
    assert(Versioned.current(spark, q, "k").count() == 3,
      "the partially-committed quarantine slice must not duplicate")
    // an all-clean batch commits nothing on the quarantine side
    val (mv9, qv9) = Versioned.appendCheckedQuarantine(
      Seq((9L, 9, "en")).toDF("k", "x", "lang"), p, checks, q, 9L, "ing")
    assert(mv9.contains(3) && qv9.isEmpty)
    assert(Versioned.latestVersion(spark, q) == 2)
    // NULL constraint results pass (SQL CHECK semantics), same as
    // appendChecked
    val (mvN, qvN) = Versioned.appendCheckedQuarantine(
      Seq((10L, 1, null.asInstanceOf[String])).toDF("k", "x", "lang"),
      p, checks, q, 10L, "ing")
    assert(mvN.contains(4) && qvN.isEmpty)
    // the quarantine table must differ from the main table
    intercept[IllegalArgumentException] {
      Versioned.appendCheckedQuarantine(b8, p, checks, p, 11L, "ing")
    }
  }

  test("maintain: mixed commit cycles under ONLY the auto-policy keep " +
      "read fan-in and history bounded with answers unchanged; the " +
      "policy picks fold, full compact, and vacuum on its own") {
    val p = freshPath("maintain")
    val cfg = Versioned.MaintainConfig(deltaCommits = 3,
      deltaBytesFrac = 0.05, fullRewriteFrac = 0.6,
      targetFileBytes = 1L << 20, smallFileFrac = 0.9, vacuumHorizon = 4)
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    val taken = scala.collection.mutable.ArrayBuffer.empty[String]
    var maxFiles = 0
    (1 to 12).foreach { i =>
      // mixed cycle: append new keys, upsert an older slice, delete a
      // few — three data commits, never a manual compaction choice
      val fresh = (i * 1000L until i * 1000L + 200L).map(k => k -> (k + i))
      Versioned.append(fresh.toDF("k", "x"), p)
      fresh.foreach { case (k, x) => expected(k) = x }
      if (i > 1) {
        val ups = ((i - 1) * 1000L until (i - 1) * 1000L + 50L)
          .map(k => k -> 999L)
        Versioned.append(ups.toDF("k", "x"), p)
        ups.foreach { case (k, x) => expected(k) = x }
        val dels = ((i - 1) * 1000L + 100L until (i - 1) * 1000L + 110L)
        Versioned.delete(dels.map(Tuple1(_)).toDF("k"), p)
        dels.foreach(expected.remove)
      }
      if (i == 6) {
        // one whale batch pushes the delta past fullRewriteFrac — the
        // policy must choose the full re-cluster here
        val whale = (900000L until 906000L).map(k => k -> k)
        Versioned.append(whale.toDF("k", "x"), p)
        whale.foreach { case (k, x) => expected(k) = x }
      }
      taken ++= Versioned.maintain(spark, p, "k", cfg).map(_._1)
      val cur = Versioned.current(spark, p, "k")
      assert(cur.select("k", "x").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == expected.toMap,
        s"cycle $i answers drifted under auto-maintenance")
      maxFiles = math.max(maxFiles, cur.inputFiles.length)
    }
    assert(taken.contains("fold"), s"policy never folded: $taken")
    assert(taken.contains("compact"),
      s"policy never full-compacted (whale cycle): $taken")
    assert(taken.contains("vacuum"), s"policy never vacuumed: $taken")
    // fan-in stayed bounded across 12 cycles (head checkpoint + at
    // most the unfolded delta commits) — not O(history)
    assert(maxFiles < 40, s"read fan-in grew to $maxFiles files")
    // history stayed bounded under the vacuum horizon
    assert(Versioned.versions(spark, p).size < 15,
      s"history grew to ${Versioned.versions(spark, p).size} versions")
    // idempotent at a quiet head
    assert(Versioned.maintain(spark, p, "k", cfg).map(_._1) ==
      Seq("noop"))
  }

  test("maintain preserves Z-ORDER clustering: the policy's full " +
      "re-cluster re-applies the _ZCOLS_ marker's interleaved sort, " +
      "so non-key skipping survives policy-driven maintenance") {
    val p = freshPath("maintain-z")
    val n = 4096L
    Versioned.append(spark.range(n).select(col("id").as("k"),
      ((col("id") * 2654435761L) % n).as("x"))
      .repartitionByRange(8, col("k")), p)
    Versioned.compactZOrder(spark, p, "k", Seq("k", "x"), nFiles = 16)
    // a whale delta (> fullRewriteFrac of the checkpoint) forces the
    // FULL branch — the one that must re-apply the Z-order, not decay
    // to key-only clustering
    Versioned.append(spark.range(n, 2 * n).select(col("id").as("k"),
      ((col("id") * 2654435761L) % n).as("x")), p)
    val cfg = Versioned.MaintainConfig(deltaCommits = 1,
      deltaBytesFrac = 0.01, fullRewriteFrac = 0.3,
      targetFileBytes = 4096L, vacuumHorizon = 2)
    val acts = Versioned.maintain(spark, p, "k", cfg)
    assert(acts.exists { case (a, d) =>
      a == "compact" && d.contains("zorder=k,x") }, s"got $acts")
    val head = Versioned.latestVersion(spark, p)
    assert(Versioned.zcolsAt(spark, p, head) == Seq("k", "x"),
      "the policy's re-cluster dropped the _ZCOLS_ marker")
    // non-key x-skipping still bites on the policy-written checkpoint
    val all = Versioned.current(spark, p, "k")
    val expect = all.filter(col("x").between(0, 255))
      .select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val zx = Versioned.snapshotRange(spark, p, head, "x", 0L, 255L)
    assert(zx.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(zx.inputFiles.length < all.inputFiles.length / 2,
      s"x-scan read ${zx.inputFiles.length} of " +
        s"${all.inputFiles.length} files after policy maintenance")
  }

  test("bloomIndex + currentAsOfPoint: point lookups skip files zone " +
      "maps can't, same answers, no false negatives") {
    val p = freshPath("bloom")
    // UNCLUSTERED ingest: hash-spread keys → every file's [min,max]
    // spans the whole key range, so zone maps alone prune nothing
    val base = spark.range(0, 4000).select(col("id").as("k"),
      (col("id") % 97).as("x"))
    Versioned.append(base.repartition(8, col("k")), p)
    Versioned.append(Seq((17L, 999L), (2500L, 111L)).toDF("k", "x"), p)
    Versioned.delete(Seq(Tuple1(40L)).toDF("k"), p)
    val unindexed = Versioned.currentPoint(spark, p, "k", 17L)
    val allFiles = unindexed.inputFiles.length
    assert(Versioned.bloomIndex(spark, p, "k") == 3)
    assert(Versioned.bloomIndex(spark, p, "k") == 0) // idempotent
    // upserted, plain, deleted, absent keys all resolve exactly
    def row(k: Long) = Versioned.currentPoint(spark, p, "k", k)
      .select("k", "x").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row(17L).toSeq == Seq((17L, 999L)))
    assert(row(2500L).toSeq == Seq((2500L, 111L)))
    assert(row(123L).toSeq == Seq((123L, 123L % 97)))
    assert(row(40L).isEmpty)     // tombstone file must NOT be skipped
    assert(row(999999L).isEmpty) // absent key
    // pruning bite: the indexed lookup opens ~1 file of the 8-file
    // delta instead of all of them
    val pruned = Versioned.currentPoint(spark, p, "k", 17L)
    assert(pruned.inputFiles.length < allFiles,
      s"bloom pruned nothing: ${pruned.inputFiles.length} of $allFiles")
    assert(pruned.inputFiles.length <= 3)
    // every key present after indexing — exhaustive no-false-negative
    // sweep over a sample of the key space
    (0L until 4000L by 211L).foreach { k =>
      val want = if (k == 40L) Seq.empty
        else if (k == 17L) Seq((17L, 999L))
        else Seq((k, k % 97))
      assert(row(k).toSeq == want, s"key $k")
    }
  }

  test("renameColumn mid-history: data preserved, asOf shows each " +
      "side's names, current/history/writes all speak the new name") {
    val p = freshPath("rename")
    Versioned.append(Seq((1L, 10), (2L, 20)).toDF("k", "score"), p)  // v1
    Versioned.append(Seq((3L, 30)).toDF("k", "score"), p)            // v2
    val rv = Versioned.renameColumn(spark, p, "score", "quality")    // v3
    assert(rv == 3)
    // time travel BELOW the rename: the old name, historical fidelity
    assert(Versioned.asOf(spark, p, 2).columns.contains("score"))
    assert(!Versioned.asOf(spark, p, 2).columns.contains("quality"))
    // at/above: the new name, SAME data (physical identity)
    val at3 = Versioned.asOf(spark, p, 3)
    assert(at3.columns.contains("quality") && !at3.columns.contains("score"))
    assert(at3.select("k", "quality").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(1L -> 10, 2L -> 20, 3L -> 30))
    // writes after the rename speak the new name and land on the
    // SAME physical column (one resolved value per key)
    Versioned.append(Seq((2L, 99)).toDF("k", "quality"), p)          // v4
    val cur = Versioned.current(spark, p, "k")
      .select("k", "quality").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur == Map(1L -> 10, 2L -> 99, 3L -> 30))
    // SCD2 history crosses the rename under one (new) name
    val h = Versioned.history(spark, p, "k")
    assert(h.columns.contains("quality") && !h.columns.contains("score"))
    assert(h.filter(col("k") === 2L).count() == 2) // 20 then 99
    // compact + read-after-compact stay consistent
    Versioned.compact(spark, p, "k")
    assert(Versioned.current(spark, p, "k")
      .select("k", "quality").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap == cur)
  }

  test("changes() spanning a rename diffs the SAME physical column " +
      "under the new name — a rename alone is no change at all") {
    val p = freshPath("rencdc")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "score"), p) // v1
    Versioned.renameColumn(spark, p, "score", "quality")                      // v2
    Versioned.append(Seq((2L, 99)).toDF("k", "quality"), p)                   // v3
    Versioned.append(Seq((4L, 40)).toDF("k", "quality"), p)                   // v4
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)                            // v5
    val ch = Versioned.changes(spark, p, "k", 1, 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=1 untouched: the rename itself must NOT read as a change
    assert(ch == Map(2L -> "update", 3L -> "delete", 4L -> "insert"), s"got $ch")
    // a pure-rename interval is empty
    assert(Versioned.changes(spark, p, "k", 1, 2).count() == 0)
  }

  test("dropColumn hides without rewriting; re-adding the name is a " +
      "fresh column — dropped bytes never resurrect; key renames work") {
    val p = freshPath("dropcol")
    Versioned.append(Seq((1L, 10, "a"), (2L, 20, "b"))
      .toDF("k", "x", "tag"), p)                      // v1
    Versioned.dropColumn(spark, p, "x")               // v2
    assert(!Versioned.asOf(spark, p, 2).columns.contains("x"))
    assert(Versioned.asOf(spark, p, 1).select("x").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(10, 20))  // still travelable
    // re-add: new physical id — old 10/20 must NOT come back
    Versioned.append(Seq((3L, 77, "c")).toDF("k", "x", "tag"), p) // v3
    val cur = Versioned.current(spark, p, "k")
    assert(cur.filter(col("k") === 3L).select("x").head().getInt(0) == 77)
    assert(cur.filter(col("k") === 1L).select("x").head().isNullAt(0) ||
      cur.filter(col("k") === 1L).select("x").head().get(0) == null,
      "dropped data resurrected through the re-added column")
    // renaming the RESOLVE KEY itself
    Versioned.renameColumn(spark, p, "k", "id")
    assert(Versioned.current(spark, p, "id").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // guards: unknown/duplicate names fail loudly
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, p, "nope", "y")
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, p, "tag", "id")
    }
    intercept[IllegalArgumentException] {
      Versioned.dropColumn(spark, p, "nope")
    }
  }

  test("type widening: int->long is a metadata commit; narrow files " +
      "upcast per file; resolve/time travel/CDC/compact/vacuum/V2 " +
      "all read wide; non-widening conversions refused") {
    import org.apache.spark.sql.types.LongType
    val p = freshPath("widen")
    Versioned.append(Seq((1L, 10), (2L, 20)).toDF("k", "x"), p) // x INT
    Versioned.widenColumn(spark, p, "x", "long")                // metadata
    // a value beyond int range proves the read path is genuinely long
    Versioned.append(Seq((3L, 5000000000L)).toDF("k", "x"), p)
    val cur = Versioned.current(spark, p, "k")
    assert(cur.schema("x").dataType == LongType)
    assert(cur.select("k", "x").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 5000000000L)))
    // widening is table-global: time travel below the widen commit
    // reads wide too (values upcast losslessly; cross-slice operators
    // never mix widths in one plan)
    assert(Versioned.asOf(spark, p, 1).schema("x").dataType == LongType)
    // a NARROW append after the widen still reads wide
    Versioned.append(Seq((4L, 40)).toDF("k", "x"), p) // int file again
    assert(Versioned.current(spark, p, "k")
      .filter(col("k") === 4).select("x").as[Long].head() == 40L)
    // CDC spanning the widen boundary diffs both snapshots at ONE
    // width (a per-slice-typed read would fail the value compare)
    val ch = Versioned.changes(spark, p, "k", 1,
        Versioned.latestVersion(spark, p))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ch == Map(3L -> "insert", 4L -> "insert"))
    // compact re-snapshots the widen map into the checkpoint; vacuum
    // reclaiming the widen commit's dir loses nothing
    Versioned.compact(spark, p, "k")
    Versioned.vacuum(spark, p, 0)
    val afterVac = Versioned.current(spark, p, "k")
    assert(afterVac.schema("x").dataType == LongType &&
      afterVac.count() == 4)
    // V2 face: widened schema, and the metadata aggregate pushdown
    // folds the (always-"long") stats correctly across widths
    val v2 = spark.read.format("graft").load(p)
    assert(v2.schema("x").dataType == LongType)
    assert(v2.agg(max("x")).head().getLong(0) == 5000000000L)
    // refusals: long is not widenable, unknown target, unknown column
    intercept[Exception] { Versioned.widenColumn(spark, p, "x", "double") }
    intercept[Exception] { Versioned.widenColumn(spark, p, "x", "string") }
    intercept[Exception] { Versioned.widenColumn(spark, p, "nope", "long") }
  }

  test("sized compact: nFiles range-partitioned key-clustered " +
      "checkpoint files; zone maps prune a point bound to one file; " +
      "resolved state unchanged") {
    val p = freshPath("szc")
    Versioned.append(spark.range(400)
      .select(col("id").as("k"), (col("id") % 7).as("x"))
      .repartition(8), p)
    Versioned.delete(Seq(5L).toDF("k"), p)
    val before = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(_.toSeq).toSet
    Versioned.compact(spark, p, "k", nFiles = 4)
    val ck = Versioned.latestVersion(spark, p)
    val fs = new java.io.File(s"$p/v=$ck")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(fs.length == 4, s"expected 4 sized files, got ${fs.length}")
    // range clustering -> a point bound opens exactly one file
    val pruned = Versioned.pruneFilesForBounds(spark, p, Seq(ck),
      Seq(("k", Some(7L), Some(7L))))
    assert(pruned.length == 1, s"zone maps should prune to 1 of 4, " +
      s"got ${pruned.length}")
    assert(Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(_.toSeq).toSet == before)
  }

  test("optimistic concurrency: a staged row-level publish aborts " +
      "against a commit or an in-flight claim below its slot after " +
      "its snapshot; commits above the slot are benign") {
    val p = freshPath("occ")
    Versioned.append(Seq((1L, 10), (2L, 20)).toDF("k", "x"), p)
    Versioned.compact(spark, p, "k") // head checkpoint v=2
    val snapshot = Versioned.latestVersion(spark, p)
    assert(snapshot == 2)

    // CASE 1: an interloper COMMITS below our slot after the snapshot
    Versioned.append(Seq((3L, 30)).toDF("k", "x"), p) // v=3
    val (v1, s1) = Versioned.beginStagedCommit(spark, p) // claims v=4
    val e1 = intercept[java.util.ConcurrentModificationException] {
      Versioned.publishStagedChecked(spark, p, v1, s1, Set.empty, snapshot)
    }
    assert(e1.getMessage.contains("committed concurrently"))
    // the conflict ABORTED the stage: slot released, nothing published
    assert(Versioned.latestVersion(spark, p) == 3)

    // CASE 2: an IN-FLIGHT claim below our slot (could publish after
    // our check — abort rather than race it)
    val (vi, si) = Versioned.beginStagedCommit(spark, p) // claims v=4
    val (v2, s2) = Versioned.beginStagedCommit(spark, p) // claims v=5
    val e2 = intercept[java.util.ConcurrentModificationException] {
      Versioned.publishStagedChecked(spark, p, v2, s2, Set.empty, 3)
    }
    assert(e2.getMessage.contains("in flight"))
    // the in-flight writer itself has nothing below it: publishes
    Versioned.publishStagedChecked(spark, p, vi, si, Set.empty, 3)
    assert(Versioned.latestVersion(spark, p) == 4)

    // CASE 3: a commit ABOVE our slot is benign ("our DML, then
    // their append" is a valid serial order)
    val (v3, s3) = Versioned.beginStagedCommit(spark, p) // reclaims v=5
    assert(v3 == 5, "the aborted slot must have been released")
    Versioned.append(Seq((4L, 40)).toDF("k", "x"), p) // commits v=6
    Versioned.publishStagedChecked(spark, p, v3, s3, Set.empty, 4)
    assert(Versioned.versions(spark, p).contains(5) &&
      Versioned.latestVersion(spark, p) == 6)
  }

  test("compactIncremental: untouched checkpoint files carry BY " +
      "REFERENCE (manifest), only dirty/undersized files rewrite, " +
      "every read path agrees with a full compact, vacuum " +
      "materializes references before reclaiming") {
    val p = freshPath("inccompact")
    val pFull = freshPath("inccompact-full")
    def fsys = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ownParquet(v: Int): Seq[String] =
      fsys.listStatus(new org.apache.hadoop.fs.Path(s"$p/v=$v"))
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSeq
    def manifest(v: Int): Seq[String] = {
      val mp = new org.apache.hadoop.fs.Path(s"$p/v=$v/_MANIFEST.tsv")
      if (!fsys.exists(mp)) Nil
      else scala.io.Source.fromInputStream(fsys.open(mp), "UTF-8")
        .getLines().filter(_.nonEmpty).toList
    }
    val base = (1L to 400L).map(i => (i, i * 3)).toDF("k", "x")
    Seq(p, pFull).foreach { t =>
      Versioned.append(base, t)                         // v1
      Versioned.compact(spark, t, "k", nFiles = 8)      // v2: 8 files
      // delta: upsert a narrow key range, delete one key, insert new
      Versioned.append((1L to 50L).map(i => (i, -i)).toDF("k", "x"), t)
      Versioned.delete(Seq(Tuple1(60L)).toDF("k"), t)
      Versioned.append((401L to 410L).map(i => (i, i)).toDF("k", "x"), t)
    }
    val vi = Versioned.compactIncremental(spark, p, "k")
    val vf = Versioned.compact(spark, pFull, "k")
    assert(vi == 6 && vf == 6)
    // the 8-file checkpoint covers keys 1..400 in tight ranges; the
    // delta touched 1..50, 60, and NEW keys — at most 2 of 8 files
    // can be dirty, the rest must carry by reference
    val m = manifest(vi)
    assert(m.size >= 6, s"expected >= 6 carried refs, got ${m.size}: $m")
    assert(m.forall(_.startsWith("v=2/")), m.toString)
    // carried files were NOT rewritten: the refs point at v=2's bytes
    assert(m.map(_.stripPrefix("v=2/")).forall(ownParquet(2).contains))
    def curMap(t: String) = Versioned.current(spark, t, "k")
      .select("k", "x").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = curMap(pFull)
    assert(curMap(p) == want, "incremental resolve != full resolve")
    assert(want(5L) == -5L && want(300L) == 900L && !want.contains(60L))
    // point lookups through zone maps hit carried AND rewritten files
    assert(Versioned.currentPoint(spark, p, "k", 300L)
      .select("x").as[Long].head() == 900L)
    assert(Versioned.currentPoint(spark, p, "k", 5L)
      .select("x").as[Long].head() == -5L)
    // range read spanning both
    assert(Versioned.currentRange(spark, p, "k", 40L, 80L).count()
      == Versioned.currentRange(spark, pFull, "k", 40L, 80L).count())
    // the log view is invariant under compaction (checkpoints excluded)
    assert(Versioned.asOf(spark, p, vi).count()
      == Versioned.asOf(spark, pFull, vf).count())
    // V2 scan + metadata COUNT(*) see the carried files
    assert(spark.read.format("graft").load(p).count()
      == spark.read.format("graft").load(pFull).count())
    // CHAINED incremental: another delta, another incremental fold —
    // v=2's clean files stay addressed at their live home, and the
    // FIRST fold's rewritten files (key-clustered with tight zones by
    // default) are themselves carriable when the new delta misses them
    Versioned.append(Seq((100L, 0L)).toDF("k", "x"), p)
    val vi2 = Versioned.compactIncremental(spark, p, "k")
    val m2 = manifest(vi2)
    assert(m2.count(_.startsWith("v=2/")) >= 6, m2.toString)
    assert(m2.exists(_.startsWith(s"v=$vi/")),
      "the prior fold's clustered rewrite should carry when untouched: " +
        m2.toString)
    val want2 = want + (100L -> 0L)
    assert(curMap(p) == want2)
    // vacuum reclaims everything below the newest checkpoint and
    // MATERIALIZES the carried references first — reads unchanged
    val reclaimed = Versioned.vacuum(spark, p, 0)
    assert(reclaimed.nonEmpty && reclaimed.contains(2))
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$p/v=2")))
    assert(curMap(p) == want2, "vacuum materialization lost rows")
    assert(Versioned.currentPoint(spark, p, "k", 300L)
      .select("x").as[Long].head() == 900L)
    // a huge min-file-bytes floor forces a full rewrite (bin-packing):
    // no manifest on the resulting checkpoint
    Versioned.append(Seq((7L, 7L)).toDF("k", "x"), p)
    val vAll = Versioned.compactIncremental(spark, p, "k",
      minFileBytes = Long.MaxValue)
    assert(manifest(vAll).isEmpty)
    assert(curMap(p) == want2 + (7L -> 7L))
    // idempotent no-op: head already a checkpoint returns it
    assert(Versioned.compactIncremental(spark, p, "k") == vAll)
  }

  test("vacuum materialization, multi-referrer: two RETAINED " +
      "incremental checkpoints referencing the same doomed file — the " +
      "file moves into the lowest referrer, the higher one re-points, " +
      "reads exact at every retained version") {
    val p = freshPath("incvacmulti")
    Versioned.append((1L to 400L).map(i => (i, i)).toDF("k", "x"), p) // v1
    Versioned.compact(spark, p, "k", nFiles = 8)                     // v2
    // two rounds of narrow-band deltas + incremental folds: ckpt v4
    // and ckpt v6 BOTH carry v=2's untouched files
    Versioned.append(Seq((5L, -5L)).toDF("k", "x"), p)               // v3
    val ck1 = Versioned.compactIncremental(spark, p, "k")            // v4
    Versioned.append(Seq((355L, -355L)).toDF("k", "x"), p)           // v5
    val ck2 = Versioned.compactIncremental(spark, p, "k")            // v6
    def manifest(v: Int): Seq[String] = {
      val f = new java.io.File(s"$p/v=$v/_MANIFEST.tsv")
      if (!f.exists()) Nil
      else { val s = scala.io.Source.fromFile(f)
        try s.getLines().filter(_.nonEmpty).toList finally s.close() }
    }
    val shared = manifest(ck1).toSet.intersect(manifest(ck2).toSet)
      .filter(_.startsWith("v=2/"))
    assert(shared.nonEmpty, s"fixture must create a shared v=2 " +
      s"reference: ${manifest(ck1)} vs ${manifest(ck2)}")
    def cur() = Versioned.current(spark, p, "k").select("k", "x")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cur()
    // horizon keeps BOTH checkpoints retained while v1..v3 (and v5)
    // below the base are reclaimed: base = ck1 (v4), doomed = {1,2,3}
    val reclaimed = Versioned.vacuum(spark, p, 2)
    assert(reclaimed == Seq(1, 2, 3), s"got $reclaimed")
    // the shared files moved into ck1 (lowest referrer) and ck2's
    // manifest re-points there — no dangling entries anywhere
    assert(manifest(ck1).forall(!_.startsWith("v=2/")))
    assert(manifest(ck2).forall(!_.startsWith("v=2/")))
    assert(manifest(ck2).exists(_.startsWith(s"v=$ck1/")),
      s"higher referrer must re-point at the moved home: ${manifest(ck2)}")
    // reads exact at the head AND at the intermediate retained slice
    // (v5 resolves off base ck1 + the v5 delta — same state as head)
    assert(cur() == want)
    assert(Versioned.currentAsOf(spark, p, "k", 5)
      .select("k", "x").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    // point lookup through a materialized (moved) file's carried stats
    assert(Versioned.currentPoint(spark, p, "k", 200L)
      .select("x").as[Long].head() == 200L)
  }

  test("bloomIndex is file-granular: files materialized into an " +
      "already-indexed dir from an unindexed home get their filters " +
      "on the next run; existing lines survive the merge") {
    val p = freshPath("bloomheal")
    Versioned.append((1L to 400L).map(i => (i, i)).toDF("k", "x"), p) // v1
    Versioned.compact(spark, p, "k", nFiles = 4)                     // v2
    Versioned.append(Seq((5L, -5L)).toDF("k", "x"), p)               // v3
    val ck = Versioned.compactIncremental(spark, p, "k")             // v4
    assert(Versioned.bloomIndex(spark, p, "k") > 0)
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an unindexed home: drop v2's bloom, then vacuum —
    // carried files materialize into v4 WITHOUT bloom lines
    f.delete(new org.apache.hadoop.fs.Path(s"$p/v=2/_BLOOM.tsv"), false)
    Versioned.vacuum(spark, p, 0)
    def bloomNames(v: Int): Set[String] = {
      val bp = new java.io.File(s"$p/v=$v/_BLOOM.tsv")
      if (!bp.exists()) Set.empty
      else { val s = scala.io.Source.fromFile(bp)
        try s.getLines().filter(_.nonEmpty)
          .map(_.takeWhile(_ != '\t')).toSet finally s.close() }
    }
    def ownNames(v: Int): Set[String] =
      new java.io.File(s"$p/v=$v").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(bloomNames(ck) != ownNames(ck),
      "fixture must leave materialized files uncovered")
    // pre-r12b a dir with ANY _BLOOM.tsv was skipped forever; the
    // file-granular pass heals exactly the uncovered files
    assert(Versioned.bloomIndex(spark, p, "k") > 0)
    assert(bloomNames(ck) == ownNames(ck),
      s"heal must cover every own file: ${bloomNames(ck)} vs ${ownNames(ck)}")
    // lookups stay exact through the healed filters
    assert(Versioned.currentPoint(spark, p, "k", 5L)
      .select("x").as[Long].head() == -5L)
    assert(Versioned.currentPoint(spark, p, "k", 300L)
      .select("x").as[Long].head() == 300L)
    assert(Versioned.currentPoint(spark, p, "k", 9999L).count() == 0)
  }

  test("cloneShallow: zero-copy clone references the source's resolved " +
      "head; writes are independent both ways; compact cuts the " +
      "dependency; a vacuumed-away source fails the clone loudly") {
    val src = freshPath("clone-src")
    val c1 = freshPath("clone-dst1")
    val c2 = freshPath("clone-dst2")
    Versioned.append((1L to 200L).map(i => (i, i * 2)).toDF("k", "x"), src)
    Versioned.append(Seq((5L, 999L)).toDF("k", "x"), src) // upsert
    Versioned.delete(Seq(Tuple1(7L)).toDF("k"), src)
    Versioned.compact(spark, src, "k", nFiles = 4)        // v4
    Versioned.append(Seq((9L, 0L)).toDF("k", "x"), src)   // dirty head
    val v = Versioned.cloneShallow(spark, src, c1, "k")
    // the clone's base = the source's auto-folded head checkpoint
    assert(v == 6 && Versioned.versions(spark, c1) == Seq(6))
    def cur(t: String) = Versioned.current(spark, t, "k")
      .select("k", "x").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cur(src)
    assert(cur(c1) == want && want(9L) == 0L && !want.contains(7L))
    // zero-copy: the clone's own dir holds no data bytes (one empty
    // schema-fixing part), everything rides the manifest
    val ownBytes = new java.io.File(s"$c1/v=6").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(ownBytes < 10000, s"clone copied data: $ownBytes bytes")
    assert(new java.io.File(s"$c1/v=6/_MANIFEST.tsv").exists())
    // write independence, both directions
    Versioned.append(Seq((1L, -1L)).toDF("k", "x"), c1)
    assert(cur(c1)(1L) == -1L && cur(src)(1L) == 2L)
    Versioned.append(Seq((2L, -2L)).toDF("k", "x"), src)
    assert(cur(src)(2L) == -2L && cur(c1)(2L) == 4L)
    // a second clone, then make it SELF-CONTAINED via compact; its
    // export registrations release (source can reclaim its files)
    Versioned.cloneShallow(spark, src, c2, "k")
    Versioned.compact(spark, c2, "k")
    Versioned.vacuum(spark, c2, 0)
    assert(Versioned.releaseClone(spark, src, c2) > 0)
    assert(Versioned.releaseClone(spark, src, c2) == 0) // idempotent
    val wantC2 = cur(c2)
    val want1 = cur(c1)
    // ROUTINE source maintenance must NOT strand clone1: compact +
    // vacuum reclaim everything except the files the export registry
    // pins — the exact hazard where materialization used to relocate
    // carried files out from under a clone whose base was an
    // incremental checkpoint (c1's base v6 carries v4's files)
    Versioned.compact(spark, src, "k")
    Versioned.vacuum(spark, src, 0)
    assert(cur(c1) == want1, "source vacuum stranded a registered clone")
    assert(cur(c2) == wantC2)
    // the source still reads correctly over its post-vacuum layout
    assert(cur(src)(2L) == -2L)
    // release clone1 too: the next vacuum reclaims the pinned files
    // (remnant sweep) and only THEN does the clone fail — loudly
    assert(Versioned.releaseClone(spark, src, c1) > 0)
    Versioned.vacuum(spark, src, 0)
    intercept[Exception] { cur(c1) }
    assert(cur(c2) == wantC2)
    // nothing markerless left behind on the source
    assert(new java.io.File(src).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .forall(d => new java.io.File(d, "_SUCCESS").exists()))
  }

  test("clone pins are observable (clonePins + detail.exported_files) " +
      "and the leased vacuum warns without ever deleting a pinned file") {
    val src = freshPath("pin-src")
    val c1 = freshPath("pin-c1")
    Versioned.append((1L to 100L).map(i => (i, i * 2)).toDF("k", "x"),
      src)                                                // v1
    Versioned.compact(spark, src, "k", nFiles = 2)        // v2 ckpt
    val t0 = System.currentTimeMillis()
    Versioned.cloneShallow(spark, src, c1, "k")
    // per-pin observability: which files, which clone, since when
    val pins = Versioned.clonePins(spark, src).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pins.nonEmpty && pins.forall(_._1 == c1))
    assert(pins.forall(p => p._3 >= t0 &&
      p._3 <= System.currentTimeMillis()),
      "pins must carry their registration time")
    assert(pins.forall(_._2.contains("/v=")), s"pins: ${pins.toSeq}")
    // the per-version view: detail counts this dir's pinned files
    val det = Versioned.detail(spark, src).collect()
      .map(r => r.getInt(0) -> r.getInt(8)).toMap
    assert(det.values.sum == pins.length,
      s"detail.exported_files ($det) must sum to the pin count")
    assert(det(2) > 0, "the cloned checkpoint's files are the pins")
    // lease: everything expires under a 1 ms lease, nothing under an
    // hour
    Thread.sleep(5)
    assert(Versioned.expiredExports(spark, src, 1L).size == pins.length)
    assert(Versioned.expiredExports(spark, src, 3600000L).isEmpty)
    // leased vacuum WARNS and keeps: the pinned files survive a
    // reclaim pass and both tables keep reading exactly
    Versioned.append(Seq((5L, 999L)).toDF("k", "x"), src) // v3
    Versioned.compact(spark, src, "k")                    // v4 ckpt
    def cur(t: String) = Versioned.current(spark, t, "k")
      .select("k", "x").as[(Long, Long)].collect().toMap
    val want = cur(src); val wantClone = cur(c1)
    Versioned.vacuum(spark, src, 0, exportLeaseMs = 1L)
    assert(cur(src) == want && cur(c1) == wantClone,
      "an expired lease must WARN, never delete")
    assert(Versioned.clonePins(spark, src).count() == pins.length)
    // release frees the pins; observability drains to zero
    assert(Versioned.releaseClone(spark, src, c1) == pins.length)
    assert(Versioned.clonePins(spark, src).count() == 0)
    assert(Versioned.detail(spark, src).collect()
      .forall(_.getInt(8) == 0))
  }

  test("quarantine observability: detail surfaces the _CHECKS_ split " +
      "per commit; quarantineStats reports the dead-letter rate from " +
      "markers alone, on either side of the family") {
    val main = freshPath("qstats-main")
    val quar = freshPath("qstats-quar")
    val cons = Seq(("x_pos", col("x") > 0))
    // batch 1: all clean; batch 2: one diverted; batch 3: all diverted
    Versioned.appendCheckedQuarantine(
      Seq((1L, 5L), (2L, 6L)).toDF("k", "x"), main, cons, quar, 1L)
    Versioned.appendCheckedQuarantine(
      Seq((3L, 7L), (4L, -1L)).toDF("k", "x"), main, cons, quar, 2L)
    Versioned.appendCheckedQuarantine(
      Seq((5L, -2L)).toDF("k", "x"), main, cons, quar, 3L)
    Versioned.append(Seq((9L, 9L)).toDF("k", "x"), main) // unchecked
    val det = Versioned.detail(spark, main).collect()
    val splits = det.filter(!_.isNullAt(9))
      .map(r => (r.getString(4), r.getLong(9), r.getLong(10))).toSet
    assert(splits == Set(("1", 2L, 0L), ("2", 1L, 1L)),
      s"main-side detail splits: $splits") // batch 3 had no clean rows
    // unchecked commits report NULL split columns
    assert(det.exists(r => r.isNullAt(9) && r.isNullAt(10)))
    val stats = Versioned.quarantineStats(spark, main).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(stats == Set(("1", 2L, 0L), ("2", 1L, 1L)))
    // the QUARANTINE side carries the same family markers for its
    // diverted epochs — monitorable from either table
    val qstats = Versioned.quarantineStats(spark, quar).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(qstats == Set(("2", 1L, 1L), ("3", 0L, 1L)))
  }

  test("reader snapshot pins: a pinned in-flight read survives a " +
      "vacuum that reclaims everything else; an expired lease " +
      "auto-releases; releasePin frees the remnants; new reads below " +
      "the base still fail loudly") {
    // expiry is judged with a clock-skew slack on top of the lease
    // (default 5 min); zero it so 1 ms leases expire in-test
    spark.conf.set("spark.graft.pinLeaseSlackMs", "0")
    val path = freshPath("readerpin")
    Versioned.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "x"), path) // v1
    Versioned.append(Seq((1L, 11L)).toDF("k", "x"), path)            // v2
    Versioned.compact(spark, path, "k")                              // v3
    Versioned.append(Seq((2L, 22L)).toDF("k", "x"), path)            // v4
    // the long reader plans against v4 and pins its snapshot
    val nPinned = Versioned.pinSnapshot(spark, path, 4, "longq",
      leaseMs = 3600000L)
    assert(nPinned > 0)
    val pins = Versioned.clonePins(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(pins.nonEmpty && pins.forall(_ == ("pin:longq", 3600000L)))
    val inFlight = Versioned.currentAsOf(spark, path, "k", 4)
      .select("k", "x")
    // table moves on; vacuum reclaims everything below the new head
    // checkpoint — EXCEPT the pinned bytes
    Versioned.append(Seq((1L, 13L)).toDF("k", "x"), path)            // v5
    Versioned.compact(spark, path, "k")                              // v6
    Versioned.vacuum(spark, path, 0)
    assert(inFlight.as[(Long, Long)].collect().toSet ==
      Set((1L, 11L), (2L, 22L)),
      "the pinned in-flight plan must keep reading mid-vacuum")
    // a NEW read below the base fails loudly — pins protect bytes,
    // not the vacuum-base contract
    intercept[Exception] {
      Versioned.currentAsOf(spark, path, "k", 4).collect()
    }
    // release + next vacuum: the markerless remnants drain
    assert(Versioned.releasePin(spark, path, "longq") == nPinned)
    assert(Versioned.releasePin(spark, path, "longq") == 0)
    Versioned.vacuum(spark, path, 0)
    assert(new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .forall(d => new java.io.File(d, "_SUCCESS").exists()),
      "released pin remnants must be reclaimed by the next vacuum")
    assert(Versioned.current(spark, path, "k").select("k", "x")
      .as[(Long, Long)].collect().toSet == Set((1L, 13L), (2L, 22L)))
    // EXPIRED lease: vacuum auto-releases (never blocks reclaim
    // forever on a crashed reader) — the pin is gone afterwards
    Versioned.append(Seq((3L, 30L)).toDF("k", "x"), path)
    Versioned.pinSnapshot(spark, path,
      Versioned.latestVersion(spark, path), "crashed", leaseMs = 1L)
    Thread.sleep(10)
    Versioned.compact(spark, path, "k")
    Versioned.vacuum(spark, path, 0)
    assert(Versioned.clonePins(spark, path)
      .filter(col("clone") === "pin:crashed").count() == 0,
      "expired reader pins must auto-release")
    // re-pinning the same name renews (replaces) the previous pin
    val head = Versioned.latestVersion(spark, path)
    Versioned.pinSnapshot(spark, path, head, "renew", leaseMs = 1L)
    Versioned.pinSnapshot(spark, path, head, "renew", leaseMs = 3600000L)
    assert(Versioned.clonePins(spark, path)
      .filter(col("clone") === "pin:renew")
      .collect().forall(_.getLong(3) == 3600000L))
    Versioned.releasePin(spark, path, "renew")
  }

  test("export-protected remnants re-materialize before the sweep: " +
      "releasing a clone never dangles the SOURCE's own incremental-" +
      "checkpoint refs into the remnant dirs") {
    val src = freshPath("clone-rem-src")
    val dst = freshPath("clone-rem-dst")
    Versioned.append((1L to 200L).map(i => (i, i * 2)).toDF("k", "x"),
      src)                                                // v1
    Versioned.compact(spark, src, "k", nFiles = 4)        // v2 ckpt
    Versioned.append(Seq((5L, 999L)).toDF("k", "x"), src) // v3 delta
    // clone at a dirty head: auto-folds to an INCREMENTAL checkpoint
    // v4 whose manifest carries v2's clean files — the clone's
    // absolute refs point into v2 and v4
    Versioned.cloneShallow(spark, src, dst, "k")
    // more source life: another delta + incremental fold — the head
    // checkpoint keeps carrying v2's files by (copied) address
    Versioned.append(Seq((7L, 777L)).toDF("k", "x"), src) // v5
    Versioned.compactIncremental(spark, src, "k")         // v6 ckpt
    def cur(t: String) = Versioned.current(spark, t, "k")
      .select("k", "x").as[(Long, Long)].collect().toMap
    val want = cur(src)
    val wantClone = cur(dst)
    Versioned.vacuum(spark, src, 0)
    // exports pinned the carried files through the sweep: both the
    // source's head (whose manifest references them) and the clone
    // still read exactly
    assert(cur(src) == want)
    assert(cur(dst) == wantClone)
    // release the clone, vacuum again: the REMNANT dirs' files that
    // the retained head checkpoint still references must materialize
    // into it before the sweep deletes the remnants
    assert(Versioned.releaseClone(spark, src, dst) > 0)
    Versioned.vacuum(spark, src, 0)
    assert(cur(src) == want,
      "source lost its own carried files after releasing the clone")
    // nothing markerless survives, and the head still reads
    assert(new java.io.File(src).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("v="))
      .forall(d => new java.io.File(d, "_SUCCESS").exists()),
      "remnant dirs must be fully reclaimed once released")
    intercept[Exception] { cur(dst) } // the clone is gone, loudly
  }

  test("cloneShallow of a column-mapped + widened source: the clone " +
      "reads logical names and widened types, then evolves its " +
      "mapping independently of the source") {
    val src = freshPath("clonemap-src")
    val dst = freshPath("clonemap-dst")
    Versioned.append((1L to 50L).map(i => (i, i.toInt)).toDF("k", "x"),
      src)
    Versioned.renameColumn(spark, src, "x", "score")      // mapped
    Versioned.widenColumn(spark, src, "score", "long")    // widened
    Versioned.append(Seq((51L, 510L)).toDF("k", "score"), src)
    Versioned.compact(spark, src, "k")
    Versioned.append(Seq((52L, 520L)).toDF("k", "score"), src) // dirty
    Versioned.cloneShallow(spark, src, dst, "k")
    def cur(t: String) = Versioned.current(spark, t, "k")
      .select("k", "score").as[(Long, Long)].collect().toMap
    val want = cur(src)
    assert(cur(dst) == want && want(51L) == 510L && want(1L) == 1L)
    // independent evolution: rename on the CLONE only
    Versioned.renameColumn(spark, dst, "score", "quality")
    assert(Versioned.current(spark, dst, "k").columns.contains("quality"))
    assert(Versioned.current(spark, src, "k").columns.contains("score"))
    // writes through the clone's new logical name land correctly
    Versioned.append(Seq((1L, 111L)).toDF("k", "quality"), dst)
    assert(Versioned.current(spark, dst, "k")
      .filter(col("k") === 1L).select("quality").as[Long].head() == 111L)
    assert(cur(src)(1L) == 1L)
    // and the clone survives routine source maintenance
    Versioned.append(Seq((53L, 530L)).toDF("k", "score"), src)
    Versioned.compact(spark, src, "k")
    Versioned.vacuum(spark, src, 0)
    assert(Versioned.current(spark, dst, "k")
      .filter(col("k") === 2L).select("quality").as[Long].head() == 2L)
  }

  test("OCC conflict-domain narrowing: a commit below a pending DML " +
      "with provably DISJOINT key ranges publishes both; overlapping " +
      "ranges (or no key to narrow on) abort retryable") {
    val p = freshPath("occnarrow")
    Versioned.append((1L to 10L).map(i => (i, i * 2)).toDF("k", "x"), p)
    Versioned.compact(spark, p, "k") // head checkpoint v=2
    val snapshot = Versioned.latestVersion(spark, p)
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // write a one-file parquet of `df` into the staging dir as `name`
    def stage(df: org.apache.spark.sql.DataFrame, staging: String,
        name: String): Unit = {
      val tmp = s"$staging-tmpw"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = f.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      assert(f.rename(part, new org.apache.hadoop.fs.Path(staging, name)))
      f.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
    def dmlRows(ks: Range) = ks.map(i => (i.toLong, 0L, false, false,
      false, 99, i.toLong)).toDF("k", "x", Versioned.DeletedCol,
      Versioned.MergeCol, Versioned.CkptCol, Versioned.VersionCol,
      Versioned.SeqCol)

    // DISJOINT: interloper inserts keys 100-110 below our slot while
    // our DML wrote keys 1-5 — both commit (no livelock under steady
    // disjoint ingest)
    val (vA, sA) = Versioned.beginStagedCommit(spark, p)     // v=3
    Versioned.append((100L to 110L).map(i => (i, i)).toDF("k", "x"), p)
    // the interloper had to publish ABOVE our claimed slot; re-stage
    // so OUR slot is above ITS commit (the race under test)
    Versioned.abortStaged(spark, p, vA, sA)
    val (vB, sB) = Versioned.beginStagedCommit(spark, p)     // v=5
    stage(dmlRows(1 to 5), sB, "part-00000-dml.parquet")
    Versioned.publishStagedChecked(spark, p, vB, sB,
      Set("part-00000-dml.parquet"), snapshot, Some("k"))
    assert(Versioned.versions(spark, p).contains(vB))
    // both writes visible in the resolved state
    val cur = Versioned.current(spark, p, "k")
    assert(cur.count() == 21) // 10 base + 11 interloper (1-5 re-stated)
    assert(cur.filter(col("k") === 3L).select("x")
      .as[Long].head() == 0L, "the DML's own rows must have won")

    // OVERLAPPING: interloper re-states key 5 below our slot — abort
    val snapshot2 = { Versioned.compact(spark, p, "k")
      Versioned.latestVersion(spark, p) }
    Versioned.append(Seq((5L, 777L)).toDF("k", "x"), p)
    val (vE, sE) = Versioned.beginStagedCommit(spark, p)
    stage(dmlRows(1 to 5), sE, "part-00000-dml.parquet")
    val e = intercept[java.util.ConcurrentModificationException] {
      Versioned.publishStagedChecked(spark, p, vE, sE,
        Set("part-00000-dml.parquet"), snapshot2, Some("k"))
    }
    assert(e.getMessage.contains("key ranges"), e.getMessage)
    // and the legacy no-key path still aborts even on disjoint keys
    val snapshot3 = Versioned.latestVersion(spark, p)
    Versioned.append(Seq((500L, 1L)).toDF("k", "x"), p)
    val (vG, sG) = Versioned.beginStagedCommit(spark, p)
    stage(dmlRows(1 to 2), sG, "part-00000-dml.parquet")
    intercept[java.util.ConcurrentModificationException] {
      Versioned.publishStagedChecked(spark, p, vG, sG,
        Set("part-00000-dml.parquet"), snapshot3, None)
    }
  }

  test("OCC narrowing on a COLUMN-MAPPED table: staged parts and the " +
      "narrowing key speak the PHYSICAL name — disjoint commits land, " +
      "overlapping ranges abort (the r13 mapped-DML write path)") {
    val p = freshPath("occmapped")
    Versioned.append((1L to 10L).map(i => (i, i * 2)).toDF("k", "x"), p)
    Versioned.renameColumn(spark, p, "k", "kid")    // physical stays 'k'
    Versioned.compact(spark, p, "kid")              // head checkpoint
    val snapshot = Versioned.latestVersion(spark, p)
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stage(df: org.apache.spark.sql.DataFrame, staging: String,
        name: String): Unit = {
      val tmp = s"$staging-tmpw"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = f.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      assert(f.rename(part, new org.apache.hadoop.fs.Path(staging, name)))
      f.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
    // staged DML parts carry the PHYSICAL column name 'k'
    def dmlRows(ks: Range) = ks.map(i => (i.toLong, 0L, false, false,
      false, 99, i.toLong)).toDF("k", "x", Versioned.DeletedCol,
      Versioned.MergeCol, Versioned.CkptCol, Versioned.VersionCol,
      Versioned.SeqCol)
    val snapOut = Versioned.stagedMapping(spark, p, snapshot + 2,
      Seq("kid", "x"))._2
    // DISJOINT: interloper (logical 'kid', physical 'k') below; both land
    Versioned.append((100L to 110L).map(i => (i, i)).toDF("kid", "x"), p)
    val (vB, sB) = Versioned.beginStagedCommit(spark, p)
    stage(dmlRows(1 to 5), sB, "part-00000-dml.parquet")
    Versioned.publishStagedChecked(spark, p, vB, sB,
      Set("part-00000-dml.parquet"), snapshot, Some("k"),
      colmap = snapOut)
    val cur = Versioned.current(spark, p, "kid")
    assert(cur.count() == 21 && cur.columns.contains("kid"))
    assert(cur.filter(col("kid") === 3L).select("x").as[Long].head() == 0L)
    // the staged commit re-snapshotted the mapping into its own dir
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$p/v=$vB/_COLMAP.tsv")))
    // OVERLAPPING: interloper re-states key 5 below our slot — abort
    val snapshot2 = { Versioned.compact(spark, p, "kid")
      Versioned.latestVersion(spark, p) }
    Versioned.append(Seq((5L, 777L)).toDF("kid", "x"), p)
    val (vE, sE) = Versioned.beginStagedCommit(spark, p)
    stage(dmlRows(1 to 5), sE, "part-00000-dml.parquet")
    val e = intercept[java.util.ConcurrentModificationException] {
      Versioned.publishStagedChecked(spark, p, vE, sE,
        Set("part-00000-dml.parquet"), snapshot2, Some("k"))
    }
    assert(e.getMessage.contains("key ranges"), e.getMessage)
  }

  test("compactZOrder on a column-mapped table: the cluster key is a " +
      "RENAMED column — layout applies under logical names before the " +
      "physical rename, no stale claim, reads unchanged") {
    val p = freshPath("zrename")
    Versioned.append((1L to 400L).map(i => (i, (i * 37) % 400, i % 7))
      .toDF("k", "score", "grp"), p)                      // v1
    Versioned.renameColumn(spark, p, "score", "quality")  // v2 (mapped)
    // the regression: commit() renamed columns to physical ids BEFORE
    // applying sortBy, so a z-expression over the renamed logical name
    // threw AnalysisException after the slot was claimed
    val v = Versioned.compactZOrder(spark, p, "k", Seq("quality", "grp"),
      nFiles = 4)
    assert(v == 3)
    // no stale claim left behind: the very next commit takes v+1
    assert(Versioned.append(Seq((401L, 1L, 1L))
      .toDF("k", "quality", "grp"), p) == 4)
    // clustered checkpoint reads back byte-correct under logical names
    val cur = Versioned.current(spark, p, "k")
    assert(cur.columns.contains("quality"))
    assert(cur.count() == 401L)
    assert(cur.filter(col("k") === 5L).select("quality").head()
      .getLong(0) == (5L * 37) % 400)
    // the quantile variant shares the fix
    val vq = Versioned.compactZOrderQuantile(spark, p, "k",
      Seq("quality"), nFiles = 2)
    assert(vq == 5)
    assert(Versioned.current(spark, p, "k").count() == 401L)
    // incremental compaction on the MAPPED table: logical key for the
    // resolve, PHYSICAL name against the zone maps, carries intact
    Versioned.compact(spark, p, "k", nFiles = 4)          // v6
    Versioned.append(Seq((3L, 999L, 0L))
      .toDF("k", "quality", "grp"), p)                    // v7 (band)
    val vInc = Versioned.compactIncremental(spark, p, "k")
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(
      s"$p/v=$vInc/_MANIFEST.tsv")),
      "mapped-table incremental fold must still carry by reference")
    val cur2 = Versioned.current(spark, p, "k")
    assert(cur2.count() == 401L)
    assert(cur2.filter(col("k") === 3L).select("quality")
      .as[Long].head() == 999L)
    assert(cur2.filter(col("k") === 300L).select("quality")
      .as[Long].head() == (300L * 37) % 400)
  }

  test("row-level DML works when the head is a metadata-only RENAME " +
      "above the checkpoint (snapshot advances to head: post-rename " +
      "mapping, no phantom OCC conflict)") {
    val wh = "target/tmp/graft-sql-warehouse-mapdml"
    spark.conf.set("spark.sql.catalog.graft_mapdml",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mapdml.warehouse", wh)
    spark.sql("DROP TABLE IF EXISTS graft_mapdml.mt")
    spark.sql("CREATE TABLE graft_mapdml.mt (k BIGINT, x INT) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql("INSERT INTO graft_mapdml.mt VALUES (1, 10), (2, 20)")
    spark.sql("CALL graft_mapdml.system.compact('mt')")
    spark.sql("ALTER TABLE graft_mapdml.mt RENAME COLUMN x TO y")
    val p = s"$wh/mt"
    // the head is now the rename commit (data-less) above the
    // checkpoint — the exact shape that used to abort with a
    // spurious "committed concurrently" OCC conflict and resolve
    // the PRE-rename (empty) mapping for the scan
    spark.sql("UPDATE graft_mapdml.mt SET y = 99 WHERE k = 1")
    val cur = Versioned.current(spark, p, "k")
    assert(Set("k", "y").subsetOf(cur.columns.toSet) &&
      !cur.columns.contains("x"))
    assert(cur.filter(col("k") === 1L).select("y").as[Int].head() == 99)
    assert(cur.filter(col("k") === 2L).select("y").as[Int].head() == 20)
    // the update's commit re-snapshotted the POST-rename mapping —
    // a later reader at head must not see the rename rolled back
    assert(Versioned.logicalToPhysical(spark, p,
      Versioned.latestVersion(spark, p)).get("y").contains("x"))
    // physical bytes untouched: the stored column is still 'x'
    // consecutive DML with no interleaving data commit: the second
    // statement plans above the first's delta (fresh incremental
    // checkpoint), still through the mapping
    spark.sql("UPDATE graft_mapdml.mt SET y = y + 1 WHERE k = 2")
    assert(Versioned.current(spark, p, "k")
      .filter(col("k") === 2L).select("y").as[Int].head() == 21)
    // a second rename directly on top (metadata-only again), then a
    // DELETE through the metadata path and a MERGE-free UPDATE
    spark.sql("ALTER TABLE graft_mapdml.mt RENAME COLUMN y TO z")
    spark.sql("UPDATE graft_mapdml.mt SET z = 0 WHERE k = 1")
    spark.sql("DELETE FROM graft_mapdml.mt WHERE k = 2")
    // every commit's colmap stayed coherent: the incremental fold
    // under UPDATE-after-rename must NOT mint a phantom extra for the
    // old logical name (it reads the slice with HEAD's mapping)
    Versioned.versions(spark, p).foreach { v =>
      val m = Versioned.logicalToPhysical(spark, p, v)
      assert(!m.values.exists(_.startsWith("y_r")),
        s"v=$v minted a phantom physical id for a renamed column: $m")
    }
    val fin = Versioned.current(spark, p, "k")
    assert(Set("k", "z").subsetOf(fin.columns.toSet) &&
      !fin.columns.contains("y"))
    assert(fin.select("k").as[Long].collect().toSeq == Seq(1L))
    assert(fin.select("z").as[Int].head() == 0)
  }

  test("metadataOnlySuffixHead and refreshColmap: the DML snapshot " +
      "advances through pure-metadata suffixes only, and a publish " +
      "re-resolves the mapping without losing slot-salted extras") {
    val p = freshPath("metasuffix")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)      // v1
    Versioned.compact(spark, p, "k")                       // v2 ckpt
    Versioned.renameColumn(spark, p, "x", "y")             // v3 meta
    Versioned.renameColumn(spark, p, "y", "z")             // v4 meta
    // contiguous metadata suffix above the checkpoint -> head
    assert(Versioned.metadataOnlySuffixHead(spark, p, 2) == 4)
    // a DATA commit ends the walk (concurrent ingest must stay above
    // the snapshot so the OCC check faces it)
    Versioned.append(Seq((2L, 20L)).toDF("k", "z"), p)     // v5 data
    assert(Versioned.metadataOnlySuffixHead(spark, p, 2) == 4)
    assert(Versioned.metadataOnlySuffixHead(spark, p, 5) == 5)
    // refreshColmap: a rename committed BELOW the claimed slot wins
    // over the stale claim-time snapshot; the write's own extras —
    // the EXPLICIT list stagedMapping returned, not a suffix match —
    // survive
    val stale = Some(Seq(("k", "k"), ("y", "x"), ("fresh", "fresh_r9")))
    val got = Versioned.refreshColmap(spark, p, 9, stale, Seq("fresh"))
    assert(got.contains(Seq(("k", "k"), ("z", "x"),
      ("fresh", "fresh_r9"))), s"got $got")
    // a snapshot entry NOT in the declared extras list is never
    // re-applied — even when its physical name LOOKS slot-salted
    // (a pre-existing column literally named x_r9 must not be
    // resurrected after a concurrent DROP by pattern-match)
    val woDecl = Versioned.refreshColmap(spark, p, 9,
      Some(Seq(("k", "k"), ("other", "other_r9"))), Nil)
    assert(woDecl.contains(Seq(("k", "k"), ("z", "x"))), s"got $woDecl")
    // a fresh mapping claiming a declared extra's logical name under a
    // DIFFERENT physical id fails loud (publishing would orphan this
    // write's staged bytes for that column)
    intercept[java.util.ConcurrentModificationException] {
      Versioned.refreshColmap(spark, p, 9,
        Some(Seq(("k", "k"), ("z", "z_r9"))), Seq("z"))
    }
    // ...but the SAME (logical, physical) pair in both is benign
    // (another commit already merged this write's pending extras)
    val dup = Versioned.refreshColmap(spark, p, 9,
      Some(Seq(("k", "k"), ("z", "x"))), Seq("z"))
    assert(dup.contains(Seq(("k", "k"), ("z", "x"))), s"got $dup")
    // unmapped table: identity
    assert(Versioned.refreshColmap(spark, p, 9, None).isEmpty)
  }

  test("snapshot race: a plain append publishing ABOVE an in-flight " +
      "schema-evolving staged write merges the write's pending extras " +
      "into its own mapping snapshot (no orphaned evolved column); an " +
      "undeclared in-flight claim refuses the append") {
    val p = freshPath("snaprace")
    Versioned.append(Seq((1L, 10L)).toDF("k", "x"), p)   // v1
    Versioned.renameColumn(spark, p, "x", "amount")      // v2 — mapped
    // an evolving staged write (a MERGE minting 'score') claims v3
    // and declares its intended snapshot
    val (v3, staging) = Versioned.beginStagedCommit(spark, p)
    val (l2p, snap, extras) = Versioned.stagedMapping(spark, p, v3,
      Seq("k", "amount", "score"))
    assert(extras == Seq("score") &&
      l2p("score") == s"score_r$v3" && l2p("amount") == "x")
    Versioned.writePendingColmap(spark, p, v3, snap)
    // a plain append claims v4 and publishes FIRST: mappingAt resolves
    // newest-at-or-below, so ITS snapshot is the one head readers see
    // — it must carry the pending extra instead of superseding it
    val v4 = Versioned.append(Seq((2L, 20L)).toDF("k", "amount"), p)
    assert(v4 == v3 + 1)
    assert(Versioned.logicalToPhysical(spark, p, v4)
      .get("score").contains(s"score_r$v3"),
      "the append's re-snapshot dropped the in-flight write's evolved " +
        "column — its data would be orphaned at head")
    // the slow writer now publishes at its LOWER slot (staged parts
    // speak physical names + meta cols, like the DML writer's)
    val part = Seq((7L, 70L, 77L)).toDF("k", "x", s"score_r$v3")
      .withColumn(Versioned.DeletedCol, lit(false))
      .withColumn(Versioned.MergeCol, lit(false))
      .withColumn(Versioned.CkptCol, lit(false))
      .withColumn(Versioned.VersionCol, lit(v3))
      .withColumn(Versioned.SeqCol, monotonically_increasing_id())
    part.coalesce(1).write.mode("append").parquet(staging)
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    Versioned.publishStagedChecked(spark, p, v3, staging, keep,
      snapshotV = 2, keyCol = Some("k"), colmap = snap,
      colmapExtras = extras)
    // pending declarations are cleaned up with their commits
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      p, s".pending-colmap-v=$v3")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      p, s".pending-colmap-v=$v4")))
    // head readers resolve v4's snapshot — which knows the column
    val cur = Versioned.current(spark, p, "k")
    assert(cur.columns.contains("score"))
    assert(cur.filter(col("k") === 7L).select("amount", "score")
      .as[(Long, Long)].head() == ((70L, 77L)))
    assert(cur.filter(col("k") === 2L).select("score").head().isNullAt(0))
    // an in-flight claim that declared NOTHING (crashed writer, or a
    // writer between claim and declaration) refuses the append —
    // unknown intent must not be published over
    val (v6, staging6) = Versioned.beginStagedCommit(spark, p)
    intercept[java.util.ConcurrentModificationException] {
      Versioned.append(Seq((3L, 30L)).toDF("k", "amount"), p)
    }
    Versioned.abortStaged(spark, p, v6, staging6)
    // after the abort the append goes straight through
    val v7 = Versioned.append(Seq((3L, 30L)).toDF("k", "amount"), p)
    assert(Versioned.current(spark, p, "k").count() == 4)
    // ...and an ABORTED evolving write's merged extra is a harmless
    // ghost: reads never surface it (no file carries its physical id)
    // and a later add of the same logical column REUSES the id
    val (v8, staging8) = Versioned.beginStagedCommit(spark, p)
    val (_, snap8, _) = Versioned.stagedMapping(spark, p, v8,
      Seq("k", "amount", "ghost"))
    Versioned.writePendingColmap(spark, p, v8, snap8)
    val v9 = Versioned.append(Seq((4L, 40L)).toDF("k", "amount"), p)
    assert(Versioned.logicalToPhysical(spark, p, v9)
      .get("ghost").contains(s"ghost_r$v8"))
    Versioned.abortStaged(spark, p, v8, staging8)
    assert(!Versioned.current(spark, p, "k").columns.contains("ghost"),
      "a ghost mapping entry with no data must not surface as a column")
    Versioned.append(Seq((5L, 50L, 99L)).toDF("k", "amount", "ghost"), p)
    val head = Versioned.latestVersion(spark, p)
    assert(Versioned.logicalToPhysical(spark, p, head)
      .get("ghost").contains(s"ghost_r$v8"),
      "re-adding the logical column must reuse the ghost physical id")
    assert(Versioned.current(spark, p, "k").filter(col("k") === 5L)
      .select("ghost").as[Long].head() == 99L)
  }

  test("dual same-column evolution: a commit sharing a NEW column " +
      "with an in-flight evolving writer ADOPTS the pending physical " +
      "id (no dual mint — either snapshot winning at head reads both " +
      "writers' data); a pending id CONFLICTING with the committed " +
      "mapping refuses") {
    val p = freshPath("adopt")
    Versioned.append(Seq((1L, 10L)).toDF("k", "x"), p)    // v1
    Versioned.renameColumn(spark, p, "x", "amount")       // v2 — mapped
    val (v3, staging) = Versioned.beginStagedCommit(spark, p)
    val (_, snap, extras) = Versioned.stagedMapping(spark, p, v3,
      Seq("k", "amount", "score"))
    Versioned.writePendingColmap(spark, p, v3, snap)
    // a plain append ALSO carrying brand-new 'score': it must write
    // under the pending id score_r3, not mint score_r4 — whichever
    // snapshot wins the head resolve, both writers' bytes stay mapped
    val v4 = Versioned.append(
      Seq((2L, 20L, 42L)).toDF("k", "amount", "score"), p)
    assert(Versioned.logicalToPhysical(spark, p, v4)
      .get("score").contains(s"score_r$v3"),
      "the append minted a second physical id for the shared column")
    // the slow writer publishes below; BOTH rows' score reads at head
    val part = Seq((7L, 70L, 77L)).toDF("k", "x", s"score_r$v3")
      .withColumn(Versioned.DeletedCol, lit(false))
      .withColumn(Versioned.MergeCol, lit(false))
      .withColumn(Versioned.CkptCol, lit(false))
      .withColumn(Versioned.VersionCol, lit(v3))
      .withColumn(Versioned.SeqCol, monotonically_increasing_id())
    part.coalesce(1).write.mode("append").parquet(staging)
    val fsys = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = fsys.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    Versioned.publishStagedChecked(spark, p, v3, staging, keep,
      snapshotV = 2, keyCol = Some("k"), colmap = snap,
      colmapExtras = extras)
    val byK = Versioned.current(spark, p, "k")
      .select("k", "score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byK == Map(1L -> None, 2L -> Some(42L), 7L -> Some(77L)),
      s"got $byK")
    // a pending entry CONFLICTING with the committed mapping (same
    // logical, different physical — diverged bases) refuses loudly
    // instead of publishing either binding
    val store = graft.io.LogStore.forSession(spark)
    val cBad = Versioned.latestVersion(spark, p) + 1
    assert(store.createExclusive(fsys,
      new org.apache.hadoop.fs.Path(p, s".claim-v=$cBad")))
    Versioned.writePendingColmap(spark, p, cBad,
      Some(Seq(("k", "k"), ("amount", "amount_r99"))))
    intercept[java.util.ConcurrentModificationException] {
      Versioned.append(Seq((3L, 30L)).toDF("k", "amount"), p)
    }
    // cleanup unblocks the table
    store.delete(fsys, new org.apache.hadoop.fs.Path(p, s".claim-v=$cBad"))
    Versioned.deletePendingColmap(spark, p, cBad)
    Versioned.append(Seq((3L, 30L)).toDF("k", "amount"), p)
    assert(Versioned.current(spark, p, "k").count() == 4)
  }

  test("mapped-table commit races, true threads: concurrent appends " +
      "racing each other AND an in-flight evolving staged write all " +
      "land (retry loop, no livelock), every snapshot keeps the " +
      "pending extra mapped, the slow writer publishes below them") {
    val p = freshPath("mapped-threads")
    Versioned.append(Seq((0L, 0L)).toDF("k", "x"), p)     // v1
    Versioned.renameColumn(spark, p, "x", "amount")       // v2 — mapped
    // the evolving staged write claims v3 and declares its intent,
    // then stays in flight while the appends hammer the table
    val (v3, staging) = Versioned.beginStagedCommit(spark, p)
    val (l2p, snap, extras) = Versioned.stagedMapping(spark, p, v3,
      Seq("k", "amount", "score"))
    Versioned.writePendingColmap(spark, p, v3, snap)
    // 4 real threads × 3 appends: they race each other through the
    // claim→declare window (transient refusals must retry through)
    // and every one re-snapshots the mapping above the staged write
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until 4).map { t =>
      new Thread(() => {
        try (0 until 3).foreach { r =>
          Versioned.append(
            Seq((100L + t * 10 + r, 1L)).toDF("k", "amount"), p)
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty,
      s"concurrent mapped appends failed: ${errs.toArray.toSeq}")
    val committed = Versioned.versions(spark, p).filter(_ > v3)
    assert(committed.size == 12, s"expected 12 append commits, got " +
      s"${committed.size}")
    committed.foreach { x =>
      assert(Versioned.logicalToPhysical(spark, p, x).get("score")
        .contains(s"score_r$v3"),
        s"v=$x's re-snapshot dropped the in-flight write's extra")
    }
    // the slow writer publishes at its LOWER slot
    val part = Seq((7L, 70L, 77L)).toDF("k", "x", s"score_r$v3")
      .withColumn(Versioned.DeletedCol, lit(false))
      .withColumn(Versioned.MergeCol, lit(false))
      .withColumn(Versioned.CkptCol, lit(false))
      .withColumn(Versioned.VersionCol, lit(v3))
      .withColumn(Versioned.SeqCol, monotonically_increasing_id())
    part.coalesce(1).write.mode("append").parquet(staging)
    val fsys = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = fsys.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    Versioned.publishStagedChecked(spark, p, v3, staging, keep,
      snapshotV = 2, keyCol = Some("k"), colmap = snap,
      colmapExtras = extras)
    val cur = Versioned.current(spark, p, "k")
    assert(cur.count() == 14) // 1 base + 12 threaded + 1 staged
    assert(cur.filter(col("k") === 7L).select("score")
      .as[Long].head() == 77L)
    assert(cur.filter(col("k") === 111L).select("score")
      .head().isNullAt(0))
    assert(l2p("amount") == "x")
  }

  test("mapped tables: zone-range, snapshotRange, and bloom point " +
      "lookup all prune on a RENAMED key column, same answers") {
    val p = freshPath("mapprune")
    val base = spark.range(0, 4000).select(col("id").as("k"),
      (col("id") % 97).as("x"))
    // range-clustered ingest: each file covers a disjoint key slice
    Versioned.append(base.repartitionByRange(8, col("k")), p)    // v1
    Versioned.renameColumn(spark, p, "k", "kid")                 // v2
    Versioned.renameColumn(spark, p, "x", "score")               // v3
    Versioned.append(Seq((17L, 999L)).toDF("kid", "score"), p)   // v4
    // zone-range pruning translates the logical key to physical 'k'
    val full = Versioned.current(spark, p, "kid")
    val ranged = Versioned.currentRange(spark, p, "kid", 10L, 40L)
    val expect = full.filter(col("kid").between(10, 40))
      .select("kid", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ranged.select("kid", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(expect((17L, 999L)))
    assert(ranged.inputFiles.length < full.inputFiles.length,
      s"zone maps pruned nothing on the renamed key: " +
        s"${ranged.inputFiles.length} of ${full.inputFiles.length}")
    // snapshotRange on the mapped checkpoint, via the renamed NON-key
    // column too (stats are keyed by the stable physical ids)
    val cp = Versioned.compact(spark, p, "kid")
    val sr = Versioned.snapshotRange(spark, p, cp, "kid", 10L, 40L)
    assert(sr.select("kid", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(sr.inputFiles.nonEmpty)
    // bloom index + point lookup under the mapping: hash-spread delta
    // so zone maps alone can't prune it, then index and look up
    Versioned.append(spark.range(4000, 8000)
      .select(col("id").as("kid"), (col("id") % 97).as("score"))
      .repartition(8, col("kid")), p)
    Versioned.delete(Seq(Tuple1(4100L)).toDF("kid"), p)
    assert(Versioned.bloomIndex(spark, p, "kid") > 0)
    def row(k: Long) = Versioned.currentPoint(spark, p, "kid", k)
      .select("kid", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(row(17L) == Seq((17L, 999L)))
    assert(row(4567L) == Seq((4567L, 4567L % 97)))
    assert(row(4100L).isEmpty)   // tombstone not skipped
    assert(row(999999L).isEmpty) // absent
    val lookedUp = Versioned.currentPoint(spark, p, "kid", 4567L)
    assert(lookedUp.inputFiles.length <
      Versioned.current(spark, p, "kid").inputFiles.length,
      "bloom + zone pruning opened every file on the mapped table")
  }

  test("column-mapped tables read through the mapping-aware V2 " +
      "source: logical names out, physical bytes untouched") {
    val p = freshPath("renv2")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    assert(spark.read.format("graft").load(p).count() == 1) // unmapped: fine
    Versioned.renameColumn(spark, p, "x", "y")
    val v2 = spark.read.format("graft").load(p)
    assert(v2.columns.contains("y") && !v2.columns.contains("x"))
    assert(v2.select("y").head().getInt(0) == 10)
  }

  test("changesIncremental equals changes() through upserts, deletes, " +
      "an in-range compact and a RESTORE; refuses merges and mapping " +
      "changes in range; empty range and fallback are exact") {
    val p = freshPath("cdcinc")
    Versioned.append(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "x"), p)                                   // v1
    Versioned.append(Seq((2L, 99L), (5L, 50L)).toDF("k", "x"), p) // v2
    Versioned.compact(spark, p, "k")                        // v3 ckpt
    Versioned.delete(Seq(3L).toDF("k"), p)                  // v4
    Versioned.append(Seq((4L, 40L)).toDF("k", "x"), p)      // v5: no-op upsert
    Versioned.restore(spark, p, "k", 1)                     // v6: diff commit
    def both(from: Int, to: Int): (Set[(Long, String)], Set[(Long, String)]) = (
      Versioned.changesIncremental(spark, p, "k", from, to)
        .as[(Long, String)].collect().toSet,
      Versioned.changes(spark, p, "k", from, to)
        .as[(Long, String)].collect().toSet)
    for ((f, t) <- Seq((1, 2), (1, 4), (2, 5), (1, 6), (4, 6), (2, 6))) {
      val (inc, full) = both(f, t)
      assert(inc == full, s"($f,$t): incremental $inc != full $full")
    }
    // the restore window unwinds everything back to v1's state
    assert(both(1, 6)._1 == Set.empty[(Long, String)])
    // a pure-compaction range is empty at metadata cost
    assert(Versioned.changesIncremental(spark, p, "k", 2, 3).count() == 0)
    // the fallback threshold routes to changes() and stays exact
    assert(Versioned.changesIncremental(spark, p, "k", 1, 4,
      maxBroadcastKeys = 1L).as[(Long, String)].collect().toSet ==
      both(1, 4)._2)
    // a NARROWER live frame (no x column): the resolved state's x
    // goes null — both faces must call that an update
    Versioned.append(Seq(Tuple1(4L)).toDF("k"), p)          // v7: k only
    val (iN, fN) = both(6, 7)
    assert(iN == fN && iN == Set((4L, "update")),
      s"narrow-frame upsert: inc $iN full $fN")
    // MERGE in range: fail-loud, directed to changes()
    Versioned.merge(Seq((2L, 77L)).toDF("k", "x"), p)       // v8 merge
    val e = intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, p, "k", 7, 8)
    }
    assert(e.getMessage.contains("MERGE"))
    // the full face stays the truth across the merge
    assert(Versioned.changes(spark, p, "k", 7, 8)
      .as[(Long, String)].collect().toSet == Set((2L, "update")))
    // mapping change in range: fail-loud
    Versioned.renameColumn(spark, p, "x", "y")              // v9
    val e2 = intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, p, "k", 8, 9)
    }
    assert(e2.getMessage.contains("mapping"))
    // NULL keys in the delta: refused loudly (separate fixture — null
    // never equi-joins, the incremental lookup cannot classify it)
    val pn = freshPath("cdcnull")
    Versioned.append(Seq((1L, 1L)).toDF("k", "x"), pn)
    Versioned.append(
      spark.sql("SELECT CAST(NULL AS BIGINT) AS k, 5L AS x"), pn)
    val eN = intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, pn, "k", 1, 2)
    }
    assert(eN.getMessage.contains("NULL keys"))
  }

  test("appendBatch replay guard SURVIVES compact+vacuum: reclaiming " +
      "a batch's marker dir migrates its _BATCH_ markers to the base " +
      "checkpoint, so the replay skips fast instead of stalling on " +
      "the surviving claim and re-committing past the stale window") {
    val p = freshPath("batchvac")
    assert(Versioned.appendBatch(
      Seq((1L, 10L)).toDF("k", "x"), p, 7L, "ing") == 1)
    assert(Versioned.appendBatch(
      Seq((2L, 20L)).toDF("k", "x"), p, 8L, "ing") == 2)
    Versioned.compact(spark, p, "k")
    assert(Versioned.vacuum(spark, p, 0) == Seq(1, 2))
    val before = Versioned.versions(spark, p)
    val t0 = System.currentTimeMillis()
    // the replay: its marker dir (v=1) is gone — the migrated marker
    // on the base must answer "committed" immediately
    assert(Versioned.appendBatch(
      Seq((1L, 10L)).toDF("k", "x"), p, 7L, "ing") == 3)
    assert(System.currentTimeMillis() - t0 < 5000,
      "replay must not stall on the surviving .claim-batch file")
    assert(Versioned.versions(spark, p) == before,
      "replay must commit nothing")
    assert(Versioned.current(spark, p, "k").count() == 2)
  }
}
