package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Sketches

class SketchViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): (String, String) = {
    val src = s"target/tmp/skv-src-$tag"
    val view = s"target/tmp/skv-view-$tag"
    Versioned.drop(spark, src)
    Versioned.drop(spark, view)
    (src, view)
  }

  /** Ground truth: registers recomputed from the resolved source. */
  private def fullRegs(src: String) =
    Sketches.hllRegisters(
      Versioned.current(spark, src, "k").filter(col("v").isNotNull)
        .select("grp", "v"), "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  private def viewRegs(h: SketchView.Handle) =
    SketchView.registers(spark, h)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("maintained registers track the full recompute through inserts, " +
      "upserts, deletes and group migration; estimate reads only the view") {
    val (src, view) = fresh("steps")
    Versioned.append(
      (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b", s"v$i"))
        .toDF("k", "grp", "v"), src)
    val h = SketchView.init(spark, src, "k", "grp", "v", view)
    assert(viewRegs(h) == fullRegs(src))
    // APPEND-ONLY: new keys — must take the fold path, match exactly
    Versioned.append(
      (301L to 400L).map(i => (i, "a", s"v$i")).toDF("k", "grp", "v"), src)
    val (_, fast1) = SketchView.refreshDetailed(spark, h)
    assert(fast1, "insert-only delta must fold registers without a resolve")
    assert(viewRegs(h) == fullRegs(src))
    // UPSERT changes values (old distinct members disappear) — scoped
    // recompute must SHRINK registers a pure fold cannot
    Versioned.append(
      (1L to 150L).map(i => (i, if (i % 3 == 0) "a" else "b", s"w$i"))
        .toDF("k", "grp", "v"), src)
    val (_, fast2) = SketchView.refreshDetailed(spark, h)
    assert(!fast2, "upserts must take the scoped recompute")
    assert(viewRegs(h) == fullRegs(src))
    // DELETE + group migration in one commit
    Versioned.delete((151L to 200L).toDF("k"), src)
    Versioned.append(Seq((201L, "a", "v201")).toDF("k", "grp", "v"), src)
    SketchView.refresh(spark, h)
    assert(viewRegs(h) == fullRegs(src))
    // estimates come off the view alone and match a direct sketch
    val est = SketchView.estimate(spark, h)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.hllDistinct(
      Versioned.current(spark, src, "k").select("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == direct)
  }

  test("source RESTORE folds into the maintained registers: the diff " +
      "commit takes the scoped recompute, registers match the rebuild") {
    val (src, view) = fresh("restore")
    Versioned.append(
      (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", s"v$i"))
        .toDF("k", "grp", "v"), src)
    val h = SketchView.init(spark, src, "k", "grp", "v", view)
    // later commits change the distinct sets, then RESTORE unwinds them
    Versioned.append(
      (1L to 80L).map(i => (i, "a", s"w$i")).toDF("k", "grp", "v"), src)
    Versioned.delete((101L to 140L).toDF("k"), src)
    SketchView.refresh(spark, h)
    assert(viewRegs(h) == fullRegs(src))
    Versioned.restore(spark, src, "k", 1)
    SketchView.refresh(spark, h)
    assert(viewRegs(h) == fullRegs(src))
    // estimates equal a direct sketch over the restored state
    val est = SketchView.estimate(spark, h)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.hllDistinct(
      Versioned.current(spark, src, "k").select("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == direct)
  }

  test("emptied group's registers tombstone away; revival folds fresh") {
    val (src, view) = fresh("empty")
    Versioned.append(Seq((1L, "a", "x"), (2L, "b", "y"))
      .toDF("k", "grp", "v"), src)
    val h = SketchView.init(spark, src, "k", "grp", "v", view)
    Versioned.delete(Seq(1L).toDF("k"), src)
    SketchView.refresh(spark, h)
    assert(viewRegs(h).keySet.forall(_._1 == "b"))
    assert(viewRegs(h) == fullRegs(src))
    Versioned.append(Seq((9L, "a", "z")).toDF("k", "grp", "v"), src)
    SketchView.refresh(spark, h)
    assert(viewRegs(h) == fullRegs(src))
  }

  test("refresh is idempotent; maintainView bounds the view history " +
      "without losing the fold lineage") {
    val (src, view) = fresh("idem")
    Versioned.append((1L to 50L).map(i => (i, "a", s"v$i"))
      .toDF("k", "grp", "v"), src)
    val h = SketchView.init(spark, src, "k", "grp", "v", view)
    val rv = SketchView.refreshedVersion(spark, h)
    assert(SketchView.refresh(spark, h) == rv) // no new source versions
    for (i <- 0 until 3) {
      Versioned.append(Seq((100L + i, "a", s"n$i")).toDF("k", "grp", "v"),
        src)
      SketchView.refresh(spark, h)
    }
    assert(Versioned.versions(spark, view).length == 4)
    SketchView.maintainView(spark, h)
    assert(Versioned.versions(spark, view).length == 1)
    assert(SketchView.refreshedVersion(spark, h) == rv + 3)
    assert(viewRegs(h) == fullRegs(src))
    // post-maintain: no-op refresh, then a fresh delta folds once
    assert(SketchView.refresh(spark, h) == rv + 3)
    Versioned.append(Seq((999L, "b", "q")).toDF("k", "grp", "v"), src)
    SketchView.refresh(spark, h)
    assert(viewRegs(h) == fullRegs(src))
  }

  test("streaming cardinality view: per-micro-batch refresh inside the " +
      "ingest sink tracks the streamed source exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (src, view) = fresh("stream")
    Versioned.append(Seq((1L, "a", "x1")).toDF("k", "grp", "v"), src)
    val h = SketchView.init(spark, src, "k", "grp", "v", view)
    val in = MemoryStream[(Long, String, String)]
    // ONE foreachBatch: idempotent source commit + idempotent register
    // refresh — the restart-safe streaming distinct-count profile
    val ingest = in.toDS().toDF("k", "grp", "v").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Versioned.appendBatch(b, src, id)
        SketchView.refresh(spark, h)
        ()
      }.start()
    try {
      in.addData((2L, "a", "x2"), (3L, "b", "y1"))
      ingest.processAllAvailable()
      assert(viewRegs(h) == fullRegs(src))
      in.addData((2L, "a", "x9")) // upsert: old value leaves the set
      ingest.processAllAvailable()
      assert(viewRegs(h) == fullRegs(src))
      val est = SketchView.estimate(spark, h)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est == Map("a" -> 2L, "b" -> 1L)) // exact at tiny n
    } finally ingest.stop()
  }
}
