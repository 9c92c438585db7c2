package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): (String, String) = {
    val src = s"target/tmp/mv-src-$tag"
    val view = s"target/tmp/mv-view-$tag"
    Versioned.drop(spark, src)
    Versioned.drop(spark, view)
    (src, view)
  }

  private def viewRows(h: MatView.Handle) =
    MatView.read(spark, h).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def fullRecompute(src: String) =
    Versioned.current(spark, src, "k")
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("x").as("s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("per-version refreshes track the full group-by through upsert, " +
      "delete, group migration and group emptying") {
    val (src, view) = fresh("steps")
    Versioned.append(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    assert(viewRows(h) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))
    // upsert k=2 with a GROUP CHANGE a -> b and a value change
    Versioned.append(Seq((2L, "b", 25L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    assert(viewRows(h) == Map("a" -> ((1L, 10L)), "b" -> ((2L, 30L))))
    // delete k=3; then empty group a entirely (delete k=1)
    Versioned.delete(Seq(3L).toDF("k"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    Versioned.delete(Seq(1L).toDF("k"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == Map("b" -> ((1L, 25L)))) // only k=2 remains
    assert(!viewRows(h).contains("a")) // emptied group tombstoned away
    // new keys revive the dead group
    Versioned.append(Seq((9L, "a", 7L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    assert(viewRows(h)("a") == ((1L, 7L)))
  }

  test("source RESTORE folds into the maintained view like any delta: " +
      "refresh after a restore matches the full recompute") {
    val (src, view) = fresh("restore")
    Versioned.append(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    // later commits: upsert with group migration, an insert, a delete
    Versioned.append(Seq((2L, "b", 25L), (4L, "c", 40L))
      .toDF("k", "grp", "x"), src)
    Versioned.delete(Seq(1L).toDF("k"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    assert(viewRows(h) == Map("b" -> ((2L, 30L)), "c" -> ((1L, 40L))))
    // RESTORE to v1: because restore is an ordinary diff commit
    // (re-stated rows + tombstones), the view folds it with NO special
    // handling — a checkpoint-shaped restore would be silently skipped
    // by the delta slice and the view would diverge forever
    Versioned.restore(spark, src, "k", 1)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    assert(viewRows(h) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))
    assert(!viewRows(h).contains("c")) // restored-away group tombstoned
    // and the view keeps tracking after the restore
    Versioned.append(Seq((5L, "c", 50L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
  }

  test("one refresh over MANY source versions collapses intermediate " +
      "states, equals the full recompute") {
    val (src, view) = fresh("batch")
    Versioned.append(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    // five source commits, no refresh in between: upsert k=1 twice
    // (only the last state may count), add k=3, delete k=2, upsert k=3
    Versioned.append(Seq((1L, "a", 100L)).toDF("k", "grp", "x"), src)
    Versioned.append(Seq((1L, "b", 50L)).toDF("k", "grp", "x"), src)
    Versioned.append(Seq((3L, "c", 9L)).toDF("k", "grp", "x"), src)
    Versioned.delete(Seq(2L).toDF("k"), src)
    Versioned.append(Seq((3L, "c", 11L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    assert(viewRows(h) == Map("b" -> ((1L, 50L)), "c" -> ((1L, 11L))))
  }

  test("refresh is idempotent and exactly-once: re-running applies " +
      "nothing, the marker survives a source compaction") {
    val (src, view) = fresh("idem")
    Versioned.append(Seq((1L, "a", 3L), (2L, "b", 4L)).toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    val v1 = Versioned.latestVersion(spark, view)
    assert(MatView.refresh(spark, h) == MatView.refreshedVersion(spark, h))
    assert(Versioned.latestVersion(spark, view) == v1) // no-op: no commit
    val before = viewRows(h)
    // delta refresh, then re-refresh: second call must be a no-op even
    // though versions() changed (checkpoint-only range)
    Versioned.append(Seq((3L, "a", 5L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    val after = viewRows(h)
    assert(after == fullRecompute(src) && after != before)
    Versioned.compact(spark, src, "k")
    val v2 = Versioned.latestVersion(spark, view)
    MatView.refresh(spark, h) // source head moved, but only a checkpoint
    assert(Versioned.latestVersion(spark, view) == v2)
    assert(viewRows(h) == after)
  }

  test("streaming lakehouse MV: per-micro-batch refresh inside the " +
      "ingest sink tracks the streamed source exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (src, view) = fresh("stream")
    Versioned.append(Seq((1L, "a", 5L)).toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    val in = MemoryStream[(Long, String, Long)]
    // ingest + MV maintenance in ONE foreachBatch: the source commit is
    // idempotent on batch id, the refresh is idempotent on source
    // version — the whole sink is restart-safe end to end
    val ingest = in.toDS().toDF("k", "grp", "x").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Versioned.appendBatch(b, src, id)
        MatView.refresh(spark, h)
        ()
      }.start()
    try {
      in.addData((2L, "a", 7L), (3L, "b", 9L))
      ingest.processAllAvailable()
      assert(viewRows(h) == fullRecompute(src))
      assert(viewRows(h) == Map("a" -> ((2L, 12L)), "b" -> ((1L, 9L))))
      in.addData((2L, "b", 11L)) // upsert migrates k=2 from a to b
      ingest.processAllAvailable()
      assert(viewRows(h) == fullRecompute(src))
      assert(viewRows(h) == Map("a" -> ((1L, 5L)), "b" -> ((2L, 20L))))
    } finally ingest.stop()
  }

  test("min/max columns: scoped recompute survives deleting a group's " +
      "extreme row (the non-invertible case deltas can't handle)") {
    val (src, view) = fresh("minmax")
    Versioned.append(Seq((1L, "a", 10L), (2L, "a", 99L), (3L, "b", 7L))
      .toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view,
      minMaxCols = Seq("x"))
    def rows() = MatView.read(spark, h).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (n, sum, min, max)
    assert(rows() == Map("a" -> ((2L, 109L, 10L, 99L)),
      "b" -> ((1L, 7L, 7L, 7L))))
    // delete the max row of group a: a pure delta cannot know the new
    // max; the scoped recompute must find 10
    Versioned.delete(Seq(2L).toDF("k"), src)
    MatView.refresh(spark, h)
    assert(rows() == Map("a" -> ((1L, 10L, 10L, 10L)),
      "b" -> ((1L, 7L, 7L, 7L))))
    // untouched group b kept its row; migration updates BOTH groups
    Versioned.append(Seq((3L, "a", 1L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    assert(rows() == Map("a" -> ((2L, 11L, 1L, 10L))))
    assert(!rows().contains("b")) // b emptied by the migration
  }

  test("min/max APPEND-ONLY refresh takes the monotone fast path (no " +
      "source resolve); upserts and deletes fall back to scoped recompute") {
    val (src, view) = fresh("mmfast")
    Versioned.append(Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("k", "grp", "x"),
      src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view,
      minMaxCols = Seq("x"))
    def rows() = MatView.read(spark, h).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // pure inserts: new keys into an existing group and a brand-new one
    Versioned.append(Seq((3L, "a", 99L), (4L, "c", 1L)).toDF("k", "grp", "x"),
      src)
    val (_, fast) = MatView.refreshDetailed(spark, h)
    assert(fast, "insert-only delta must fold extremes without a resolve")
    assert(rows() == Map("a" -> ((2L, 109L, 10L, 99L)),
      "b" -> ((1L, 5L, 5L, 5L)), "c" -> ((1L, 1L, 1L, 1L))))
    // an UPSERT (prior state exists) must fall back: the old max 99
    // leaves and deltas can't know the survivor
    Versioned.append(Seq((3L, "a", 50L)).toDF("k", "grp", "x"), src)
    val (_, fast2) = MatView.refreshDetailed(spark, h)
    assert(!fast2, "an upsert must take the scoped recompute")
    assert(rows()("a") == ((2L, 60L, 10L, 50L)))
    // a DELETE must fall back likewise
    Versioned.delete(Seq(1L).toDF("k"), src)
    val (_, fast3) = MatView.refreshDetailed(spark, h)
    assert(!fast3, "a delete must take the scoped recompute")
    assert(rows()("a") == ((1L, 50L, 50L, 50L)))
    // back to append-only: fast again, extremes widen both ways
    Versioned.append(Seq((5L, "a", 7L), (6L, "a", 200L)).toDF("k", "grp", "x"),
      src)
    val (_, fast4) = MatView.refreshDetailed(spark, h)
    assert(fast4)
    assert(rows()("a") == ((3L, 257L, 7L, 200L)))
  }

  test("refresh fails loudly when the source was vacuumed past the " +
      "view; a FRESH view bootstraps from the vacuum-base checkpoint") {
    val (src, view) = fresh("vac")
    Versioned.append(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "grp", "x"),
      src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    // v2 append, v3 checkpoint, v4 append; vacuum reclaims v1-v2
    Versioned.append(Seq((3L, "a", 3L)).toDF("k", "grp", "x"), src)
    Versioned.compact(spark, src, "k")
    Versioned.append(Seq((4L, "c", 4L)).toDF("k", "grp", "x"), src)
    assert(Versioned.vacuum(spark, src, 1).nonEmpty)
    // stale view (refreshed=1 < base): the reclaimed deltas are gone —
    // a silent partial fold would be permanent drift, so it must THROW
    assertThrows[IllegalArgumentException](MatView.refresh(spark, h))
    // a fresh view on the same vacuumed source: the base checkpoint
    // stands in for the reclaimed prefix
    val view2 = view + "-rebuilt"
    Versioned.drop(spark, view2)
    val h2 = MatView.init(spark, src, "k", "grp", Seq("x"), view2)
    assert(viewRows(h2) == fullRecompute(src))
    assert(viewRows(h2) == Map("a" -> ((2L, 4L)), "b" -> ((1L, 2L)),
      "c" -> ((1L, 4L))))
  }

  test("refresh refuses while a source version slot at or below its " +
      "head is claimed but unpublished (in-flight writer)") {
    val (src, view) = fresh("claims")
    Versioned.append(Seq((1L, "a", 1L)).toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an in-flight writer holds slot 2; a faster writer publishes v3
    f.create(new org.apache.hadoop.fs.Path(src, ".claim-v=2"), true).close()
    Versioned.append(Seq((3L, "b", 3L)).toDF("k", "grp", "x"), src)
    assert(Versioned.latestVersion(spark, src) == 3)
    // folding (1, 3] now would skip slot 2's late publish forever
    assertThrows[IllegalArgumentException](MatView.refresh(spark, h))
    // the writer crashed; its claim is swept (vacuum's age guard,
    // simulated) — refresh then proceeds and matches the recompute
    f.delete(new org.apache.hadoop.fs.Path(src, ".claim-v=2"), false)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
  }

  test("two RACING maintainers: exactly one view version commits, the " +
      "loser adopts it — the atomic batch claim prevents double-folds") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val (src, view) = fresh("race")
    Versioned.append(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "grp", "x"),
      src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    Versioned.append(Seq((3L, "a", 10L), (2L, "a", 5L)).toDF("k", "grp", "x"),
      src)
    val before = Versioned.latestVersion(spark, view)
    val rs = Await.result(Future.sequence(
      (1 to 2).map(_ => Future(MatView.refresh(spark, h)))), 2.minutes)
    assert(rs.forall(_ == Versioned.latestVersion(spark, src)))
    assert(Versioned.latestVersion(spark, view) == before + 1,
      "exactly one view commit may land for one source head")
    assert(viewRows(h) == fullRecompute(src))
    // key 2 migrated b -> a in the delta: a holds all three keys
    assert(viewRows(h) == Map("a" -> ((3L, 16L))))
  }

  test("broadcast guard estimates BYTES, not rows: wide string keys " +
      "overflow the threshold at tiny row counts; narrow ones don't") {
    val wide = (1 to 500).map(i => ("k" * 200000) + i).toDF("k")
    assert(MatView.keyBytes(wide, "k") > MatView.BroadcastBytes,
      "500 x 200kB keys are ~100 MB — far past a safe broadcast")
    val narrow = (1 to 500).map(_.toLong).toDF("k")
    assert(MatView.keyBytes(narrow, "k") < (1L << 20))
  }

  test("maintainView bounds the view's own history; refresh lineage " +
      "survives the vacuum (no double-fold afterwards)") {
    val (src, view) = fresh("maint")
    Versioned.append(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "grp", "x"),
      src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    // four more refreshes: the view accretes a version per fold
    (1 to 4).foreach { i =>
      Versioned.append(Seq((10L + i, "a", i.toLong)).toDF("k", "grp", "x"),
        src)
      MatView.refresh(spark, h)
    }
    val rv = MatView.refreshedVersion(spark, h)
    assert(Versioned.versions(spark, view).length == 5)
    MatView.maintainView(spark, h)
    // one checkpoint remains; the carried marker preserves lineage
    assert(Versioned.versions(spark, view).length == 1)
    assert(MatView.refreshedVersion(spark, h) == rv,
      "vacuum must not erase the refresh lineage")
    assert(viewRows(h) == fullRecompute(src))
    // no new source versions -> refresh no-ops (a lineage loss here
    // would re-fold everything and double-count)
    assert(MatView.refresh(spark, h) == rv)
    assert(viewRows(h) == fullRecompute(src))
    // and fresh deltas still fold exactly once
    Versioned.append(Seq((99L, "c", 9L)).toDF("k", "grp", "x"), src)
    MatView.refresh(spark, h)
    assert(viewRows(h) == fullRecompute(src))
    assert(viewRows(h)("c") == ((1L, 9L)))
  }

  test("MERGE commits in the delta range fail loudly") {
    val (src, view) = fresh("merge")
    Versioned.append(Seq((1L, "a", 3L)).toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    Versioned.merge(Seq((1L, 99L)).toDF("k", "x"), src)
    assertThrows[IllegalArgumentException](MatView.refresh(spark, h))
  }

  test("view CHANGE FEED: the maintained view is itself a streaming " +
      "source — each refresh's group deltas arrive downstream exactly " +
      "once, tombstones included") {
    val (src, view) = fresh("feed")
    Versioned.append(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    // the view is a Versioned table, so logStream composes unchanged:
    // downstream consumers get per-refresh aggregate deltas instead of
    // re-reading the whole view — the MV change-feed at 100 TB
    val q = Versioned.logStream(spark, view)
      .writeStream.format("memory").queryName("mvfeed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def got = spark.table("mvfeed")
        .select(col("g"), col("n_rows"), col("sum_x"),
          coalesce(col(Versioned.DeletedCol), lit(false)).as("del"),
          col(Versioned.VersionCol))
        .collect()
        .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)),
          r.getBoolean(3), r.getInt(4))).toSet
      assert(got == Set(("a", Some(1L), Some(10L), false, 1),
        ("b", Some(1L), Some(20L), false, 1)))
      // refresh 1: group b grows — ONE delta row for b, none for a
      Versioned.append(Seq((3L, "b", 5L)).toDF("k", "grp", "x"), src)
      MatView.refresh(spark, h)
      q.processAllAvailable()
      assert(got.count(_._1 == "b") == 2)
      assert(got.count(_._1 == "a") == 1, "untouched group must not re-emit")
      assert(got(("b", Some(2L), Some(25L), false, 2)))
      // refresh 2: group a empties — the change feed carries a TOMBSTONE
      Versioned.delete(Seq(1L).toDF("k"), src)
      MatView.refresh(spark, h)
      q.processAllAvailable()
      assert(got.exists(r => r._1 == "a" && r._4), "emptied group must " +
        "tombstone in the feed")
      // feed replays to the view's current state
      val live = got.groupBy(_._1).map { case (g, rs) => rs.maxBy(_._5) }
        .filter(!_._4).map(r => r._1 -> ((r._2.get, r._3.get))).toMap
      assert(live == viewRows(h))
    } finally q.stop()
  }
}

/** Maintained JOIN view: fk-grain materialization, dim joined at read. */
class JoinViewSpec extends graft.SparkSpec {
  import spark.implicits._

  test("JoinView: fact deltas fold at delta cost; dim changes are " +
      "visible at the next read with ZERO refresh; inner-join drop " +
      "and reingest semantics hold") {
    val fact = "target/tmp/jv-fact"
    val dim = "target/tmp/jv-dim"
    val view = "target/tmp/jv-view"
    Seq(fact, dim, view).foreach(Versioned.drop(spark, _))
    // fact: (id, fk, x); dim: (dk, region)
    Versioned.append((1L to 100L).map(i =>
      (i, i % 10, i)).toDF("id", "fk", "x"), fact)
    Versioned.append((0L until 10L).map(d =>
      (d, if (d < 5) "east" else "west")).toDF("dk", "region"), dim)
    val h = JoinView.init(spark, fact, "id", "fk", Seq("x"),
      dim, "dk", "region", view)
    def served(): Map[String, (Long, Long)] =
      JoinView.read(spark, h).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def expect(): Map[String, (Long, Long)] =
      Versioned.current(spark, fact, "id")
        .join(Versioned.current(spark, dim, "dk"),
          col("fk") === col("dk"))
        .groupBy("region").agg(count(lit(1)), sum("x"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(served() == expect() && served().keySet == Set("east", "west"))
    // fact deltas: upsert (fk migration 3 -> 7 crosses regions),
    // delete, insert — one refresh folds all three
    Versioned.append(Seq((3L, 7L, 300L)).toDF("id", "fk", "x"), fact)
    Versioned.delete(Seq(Tuple1(10L)).toDF("id"), fact)
    Versioned.append(Seq((200L, 2L, 1000L)).toDF("id", "fk", "x"), fact)
    JoinView.refresh(spark, h)
    assert(served() == expect())
    // DIM attribute change: fk 2 moves east -> west. NO refresh — the
    // read must reflect it immediately (fk-grain state untouched)
    val vBefore = Versioned.latestVersion(spark, view)
    Versioned.append(Seq((2L, "west")).toDF("dk", "region"), dim)
    assert(served() == expect())
    assert(served()("west")._2 >= 1000L) // the new fact mass moved too
    assert(Versioned.latestVersion(spark, view) == vBefore,
      "dim change must not touch the materialized state")
    // inner-join drop: deleting a dim row hides its fk's mass...
    Versioned.delete(Seq(Tuple1(9L)).toDF("dk"), dim)
    assert(served() == expect())
    // ...and reingesting the dim row brings it back — nothing was lost
    Versioned.append(Seq((9L, "east")).toDF("dk", "region"), dim)
    assert(served() == expect())
    // the fk-grain state is directly addressable
    val byKey = JoinView.readByKey(spark, h).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byKey(7L) == (7L to 97L by 10L).sum + 300L)
    // refresh is idempotent
    val v2 = JoinView.refresh(spark, h)
    assert(JoinView.refresh(spark, h) == v2)
  }

  test("JoinView snowflake + min/max: two grouping attributes from " +
      "two dim hops; a delete removing a group extreme refreshes " +
      "correctly; second-hop dim changes cost zero refresh") {
    val fact = "target/tmp/jvs-fact"
    val dim1 = "target/tmp/jvs-dim1"
    val dim2 = "target/tmp/jvs-dim2"
    val view = "target/tmp/jvs-view"
    Seq(fact, dim1, dim2, view).foreach(Versioned.drop(spark, _))
    // fact (id, fk, x); dim1 (dk, tag, snow) — snow is the second
    // hop's fk; dim2 (sk, region)
    Versioned.append((1L to 60L).map(i =>
      (i, i % 6, i)).toDF("id", "fk", "x"), fact)
    Versioned.append((0L until 6L).map(d =>
      (d, s"t$d", d % 2)).toDF("dk", "tag", "snow"), dim1)
    Versioned.append(Seq((0L, "east"), (1L, "west"))
      .toDF("sk", "region"), dim2)
    val dims = Seq(
      JoinView.DimLink(dim1, "dk", "fk", Seq("tag", "snow")),
      JoinView.DimLink(dim2, "sk", "snow", Seq("region")))
    val h = JoinView.init(spark, fact, "id", "fk", Seq("x"), dims,
      Seq("tag", "region"), view, minMaxCols = Seq("x"))
    def served(): Map[(String, String), (Long, Long, Long, Long)] =
      JoinView.read(spark, h).collect().map(r =>
        (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
    def expect(): Map[(String, String), (Long, Long, Long, Long)] =
      Versioned.current(spark, fact, "id")
        .join(Versioned.current(spark, dim1, "dk"), col("fk") === col("dk"))
        .join(Versioned.current(spark, dim2, "sk"), col("snow") === col("sk"))
        .groupBy("tag", "region")
        .agg(count(lit(1)), sum("x"), min("x"), max("x"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
    assert(served() == expect())
    // odd fks (1,3,5) snow to dim2 key 1 = "west"; fk 5's max x is 59
    assert(served()(("t5", "west")) == ((10L, (5L to 59L by 6L).sum,
      5L, 59L)))
    // DELETE the group extreme (id 59 — t5's max): the min/max
    // refresh must re-derive the group's true max (53), not keep the
    // stale folded 59
    Versioned.delete(Seq(Tuple1(59L)).toDF("id"), fact)
    JoinView.refresh(spark, h)
    assert(served() == expect())
    assert(served()(("t5", "west"))._4 == 53L,
      "stale group max survived the extreme-removing delete")
    // SECOND-hop dim change with ZERO refresh: renaming the west
    // region re-labels every odd-fk group at the very next read
    val vBefore = Versioned.latestVersion(spark, view)
    Versioned.append(Seq((1L, "far-west")).toDF("sk", "region"), dim2)
    assert(served() == expect())
    assert(served().keySet.exists(_._2 == "far-west") &&
      !served().keySet.exists(_._2 == "west"))
    assert(Versioned.latestVersion(spark, view) == vBefore,
      "a snowflake dim change must not touch the materialized state")
  }
}
