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

  test("MERGE commits in the delta range fail loudly") {
    val (src, view) = fresh("merge")
    Versioned.append(Seq((1L, "a", 3L)).toDF("k", "grp", "x"), src)
    val h = MatView.init(spark, src, "k", "grp", Seq("x"), view)
    Versioned.merge(Seq((1L, 99L)).toDF("k", "x"), src)
    assertThrows[IllegalArgumentException](MatView.refresh(spark, h))
  }
}
