package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming CDC face ([[Versioned.changesStreamTo]] /
  * [[Versioned.classifyChanges]]) and the auto-dispatching CDC kernel
  * ([[Versioned.changesAuto]] / SQL `graft_changes_auto`). */
class ChangesStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rmDir(p: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(p), true)
    ()
  }

  private def feed(sink: String): Set[(Long, String, Int)] =
    spark.read.parquet(s"$sink/v=*")
      .select("k", "change_type", "change_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  private def perVersionExpected(src: String): Set[(Long, String, Int)] =
    (1 to Versioned.latestVersion(spark, src)).flatMap { v =>
      Versioned.changesAuto(spark, src, "k", v - 1, v).collect()
        .map(r => (r.getLong(0), r.getString(1), v))
    }.toSet

  test("streaming CDC: per-version change rows land exactly once " +
      "across restarts; a re-run with no new commits adds nothing; " +
      "folding the feed reproduces the current key set") {
    val src = "target/tmp/cdcstream-src"
    val sink = "target/tmp/cdcstream-sink"
    val ckpt = "target/tmp/cdcstream-ckpt"
    Seq(src, sink, ckpt).foreach(rmDir)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "s", "n"), src)                            // v1
    Versioned.append(Seq((2L, "b", 25L)).toDF("k", "s", "n"), src) // v2
    Versioned.delete(Seq(3L).toDF("k"), src)                  // v3
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt)
      .awaitTermination()
    val run1 = feed(sink)
    assert(run1 == Set(
      (1L, "insert", 1), (2L, "insert", 1), (3L, "insert", 1),
      (2L, "update", 2),
      (3L, "delete", 3)))
    // RESTART with more commits — same checkpoint resumes at v4; the
    // already-delivered versions are not re-classified
    Versioned.append(Seq((4L, "d", 40L)).toDF("k", "s", "n"), src) // v4
    Versioned.delete(Seq(1L).toDF("k"), src)                  // v5
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt)
      .awaitTermination()
    val run2 = feed(sink)
    assert(run2 == run1 ++ Set((4L, "insert", 4), (1L, "delete", 5)))
    assert(run2 == perVersionExpected(src),
      "streamed feed must equal the per-version batch kernel's union")
    // idle re-run: exactly-once means NOTHING new
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt)
      .awaitTermination()
    assert(feed(sink) == run2)
    // duplicates would survive the Set compare — check raw counts too
    val raw = spark.read.parquet(s"$sink/v=*")
      .select("k", "change_type", "change_version")
    assert(raw.count() == run2.size, "no duplicate change rows")
    // fold the feed: latest change per key, drop deletes == current
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("change_version").desc)
    val folded = raw.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("change_type") =!= "delete")
      .select("k").as[Long].collect().toSet
    val current = Versioned.current(spark, src, "k")
      .select("k").as[Long].collect().toSet
    assert(folded == current)
    // the whole-history anchor now works: changes(0, head) == all
    // current keys as inserts
    val fromZero = Versioned.changes(spark, src, "k", 0,
      Versioned.latestVersion(spark, src)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromZero == current.map(k => (k, "insert")))
  }

  test("bounded streaming-CDC backfill: a 5-commit history at " +
      "maxVersionsPerTrigger=2 drains as 3 individually-checkpointed " +
      "epochs whose folded feed equals the per-version kernel union; " +
      "a mid-backfill kill replays its epoch exactly once") {
    val src = "target/tmp/cdcstream-bf-src"
    val sink = "target/tmp/cdcstream-bf-sink"
    val sink2 = "target/tmp/cdcstream-bf-sink2"
    val ckpt = "target/tmp/cdcstream-bf-ckpt"
    val ckpt2 = "target/tmp/cdcstream-bf-ckpt2"
    Seq(src, sink, sink2, ckpt, ckpt2).foreach(rmDir)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), src) // v1
    Versioned.append(Seq((3L, "c", 30L)).toDF("k", "s", "n"), src)  // v2
    Versioned.append(Seq((2L, "b", 25L)).toDF("k", "s", "n"), src)  // v3
    Versioned.delete(Seq(1L).toDF("k"), src)                        // v4
    Versioned.append(Seq((4L, "d", 40L)).toDF("k", "s", "n"), src)  // v5
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    // admission: each epoch is its own sink commit, classifying at
    // most 2 source versions — never one unbounded batch 0
    val sinkVs = Versioned.versions(spark, sink)
    assert(sinkVs.size == 3, s"expected 3 epochs, got versions $sinkVs")
    val perEpoch = sinkVs.map(v =>
      spark.read.parquet(s"$sink/v=$v").select("change_version")
        .distinct().as[Int].collect().toSet)
    assert(perEpoch == Seq(Set(1, 2), Set(3, 4), Set(5)),
      s"epoch boundaries must follow the cap, got $perEpoch")
    // admission-invariant fold: the capped drain accumulates exactly
    // the single-epoch feed
    assert(feed(sink) == perVersionExpected(src))
    // mid-backfill KILL: the same pipe, dying AFTER epoch 0's append
    // landed but BEFORE the engine committed the epoch — the restart
    // re-delivers batch 0 and the sink's _BATCH_ marker absorbs it
    // the manual pipe must commit under the SAME checkpoint-scoped
    // ingest id changesStreamTo derives, or the resumed pipe would
    // not recognize the killed epoch's marker
    val ckptP = new org.apache.hadoop.fs.Path(ckpt2)
    val ingest = Versioned.ingestIdFor("cdc",
      ckptP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(ckptP).toString)
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "2").load(src)
      .writeStream.option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        Versioned.appendBatch(
          Versioned.classifyChanges(b, src, "k"), sink2, id, ingest)
        if (id == 0) throw new RuntimeException("killed mid-backfill")
        ()
      }.start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(Versioned.versions(spark, sink2).size == 1,
      "epoch 0 must have landed before the kill")
    Versioned.changesStreamTo(spark, src, "k", sink2, ckpt2,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(feed(sink2) == feed(sink),
      "post-restart feed must equal the unkilled run's")
    assert(spark.read.parquet(s"$sink2/v=*").count() == feed(sink).size,
      "the replayed epoch must not duplicate rows")
    // REBUILT stream (checkpoint lost, fresh location): epoch ids
    // restart at 0, but the fresh checkpoint carries a fresh ingest
    // scope — new source versions are never mistaken for the OLD
    // stream's replays and swallowed (the standard fresh-checkpoint
    // contract: everything re-delivers instead)
    Versioned.append(Seq((9L, "z", 90L)).toDF("k", "s", "n"), src) // v6
    val ckpt3 = "target/tmp/cdcstream-bf-ckpt3"
    rmDir(ckpt3)
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt3,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(feed(sink).contains((9L, "insert", 6)),
      "a rebuilt stream must deliver new source versions, not " +
        "swallow them as the old stream's replays")
  }

  test("streaming replication: current(dst) tracks current(src) " +
      "across capped epochs and restarts; a vacuumed source " +
      "bootstraps from its base checkpoint; MERGE refuses mid-stream") {
    val src = "target/tmp/repl-src"
    val dst = "target/tmp/repl-dst"
    val dst2 = "target/tmp/repl-dst2"
    val ckpt = "target/tmp/repl-ckpt"
    val ckpt2 = "target/tmp/repl-ckpt2"
    Seq(src, dst, dst2, ckpt, ckpt2).foreach(rmDir)
    def cur(p: String): Set[(Long, String, Long)] =
      Versioned.current(spark, p, "k").select("k", "s", "n")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2))).toSet
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "s", "n"), src)                            // v1
    Versioned.append(Seq((2L, "b", 25L)).toDF("k", "s", "n"), src) // v2
    Versioned.delete(Seq(3L).toDF("k"), src)                  // v3
    Versioned.replicateStreamTo(spark, src, "k", dst, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(cur(dst) == cur(src) &&
      cur(dst) == Set((1L, "a", 10L), (2L, "b", 25L)))
    // capped epochs: one replica commit per epoch, each folded to at
    // most one row per key (v1+v2 fold key 2 to its newest state)
    val vs = Versioned.versions(spark, dst)
    assert(vs.size == 2, s"expected 2 epochs, got $vs")
    assert(spark.read.parquet(s"$dst/v=${vs.head}")
      .groupBy("k").count().filter(col("count") > 1).isEmpty,
      "an epoch's fold must carry at most one row per key")
    // restart: resumes at the first undelivered version
    Versioned.append(Seq((4L, "d", 40L)).toDF("k", "s", "n"), src) // v4
    Versioned.delete(Seq(1L).toDF("k"), src)                  // v5
    Versioned.replicateStreamTo(spark, src, "k", dst, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(cur(dst) == cur(src))
    // idle re-run: nothing new lands
    val nV = Versioned.versions(spark, dst).size
    Versioned.replicateStreamTo(spark, src, "k", dst, ckpt,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(Versioned.versions(spark, dst).size == nV)
    // VACUUMED source: a fresh replica bootstraps from the base
    // checkpoint (the only copy of the reclaimed prefix)
    Versioned.compact(spark, src, "k")
    Versioned.vacuum(spark, src, 0)
    Versioned.replicateStreamTo(spark, src, "k", dst2, ckpt2,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(cur(dst2) == cur(src))
    // the PRE-vacuum replica's checkpoint fell behind the horizon:
    // the resume refuses loudly (the stream contract), never a
    // silent re-anchor
    val ev = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      Versioned.replicateStreamTo(spark, src, "k", dst, ckpt,
        maxVersionsPerTrigger = 2).awaitTermination()
    }
    assert(String.valueOf(ev.getMessage).contains("vacuum horizon") ||
      ev.getCause != null && String.valueOf(ev.getCause.getMessage)
        .contains("vacuum horizon"))
    // MERGE mid-stream RESTATES instead of refusing: the overlay
    // epoch resolves its touched keys against the source at the
    // epoch's end version — no restart, replica == source resolve
    Versioned.merge(Seq((2L, 99L)).toDF("k", "n"), src)
    Versioned.replicateStreamTo(spark, src, "k", dst2, ckpt2,
      maxVersionsPerTrigger = 2).awaitTermination()
    assert(cur(dst2) == cur(src),
      s"merge epoch must restate: ${cur(dst2)} vs ${cur(src)}")
    assert(cur(dst2).exists(r => r._1 == 2L && r._3 == 99L &&
      r._2 == "b"), // the overlay kept the untouched column
      s"overlay semantics lost in restatement: ${cur(dst2)}")
  }

  test("merge-tolerant replication: an epoch mixing MERGE with " +
      "deletes/inserts restates touched keys only (tombstones " +
      "synthesized, untouched keys not rewritten); NULL keys under a " +
      "merge epoch refuse loudly") {
    val src = "target/tmp/repl-merge-src"
    val dst = "target/tmp/repl-merge-dst"
    val ckpt = "target/tmp/repl-merge-ckpt"
    Seq(src, dst, ckpt).foreach(rmDir)
    def cur(p: String): Set[(Long, String, Long)] =
      Versioned.current(spark, p, "k").select("k", "s", "n")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2))).toSet
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
        (4L, "d", 40L)).toDF("k", "s", "n"), src)            // v1
    Versioned.replicateStreamTo(spark, src, "k", dst, ckpt)
      .awaitTermination()
    assert(cur(dst) == cur(src))
    // one epoch carrying: overlay on 2, overlay on 3 THEN delete 3,
    // delete-then-reinsert 1, fresh insert 5 — the restatement must
    // agree with the source resolve on every touched key
    Versioned.merge(Seq((2L, 99L)).toDF("k", "n"), src)       // v2
    Versioned.merge(Seq((3L, 77L)).toDF("k", "n"), src)       // v3
    Versioned.delete(Seq(3L).toDF("k"), src)                  // v4
    Versioned.delete(Seq(1L).toDF("k"), src)                  // v5
    Versioned.append(Seq((1L, "a2", 11L), (5L, "e", 50L))
      .toDF("k", "s", "n"), src)                              // v6
    Versioned.replicateStreamTo(spark, src, "k", dst, ckpt,
      maxVersionsPerTrigger = 16).awaitTermination()
    assert(cur(dst) == cur(src) && cur(dst) == Set(
      (1L, "a2", 11L), (2L, "b", 99L), (4L, "d", 40L), (5L, "e", 50L)),
      s"restated replica diverges: ${cur(dst)} vs ${cur(src)}")
    // the restated epoch carries ONLY the touched keys (4 was never
    // touched — a restatement that rewrote the whole table would be
    // a full-copy, not a delta)
    val lastV = Versioned.versions(spark, dst).max
    val epochKeys = spark.read.parquet(s"$dst/v=$lastV")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(epochKeys == Set(1L, 2L, 3L, 5L),
      s"epoch must carry exactly the touched keys, got $epochKeys")
    assert(spark.read.parquet(s"$dst/v=$lastV")
      .groupBy("k").count().filter(col("count") > 1).isEmpty,
      "the restated fold must carry at most one row per key")
    // downstream composition: the replica's own resolve serves the
    // tombstone (3 stays dead) and a further merge replicates too
    Versioned.merge(Seq((5L, 55L)).toDF("k", "n"), src)       // v7
    Versioned.replicateStreamTo(spark, src, "k", dst, ckpt)
      .awaitTermination()
    assert(cur(dst) == cur(src) &&
      cur(dst).exists(r => r._1 == 5L && r._3 == 55L))
    // NULL key + merge in one epoch: loud, typed-message refusal
    val srcN = "target/tmp/repl-merge-null-src"
    val dstN = "target/tmp/repl-merge-null-dst"
    val ckptN = "target/tmp/repl-merge-null-ckpt"
    Seq(srcN, dstN, ckptN).foreach(rmDir)
    Versioned.append(Seq((Some(1L), "a", 10L))
      .toDF("k", "s", "n"), srcN)
    Versioned.append(Seq((Option.empty[Long], "z", 0L))
      .toDF("k", "s", "n"), srcN)
    Versioned.merge(Seq((1L, 99L)).toDF("k", "n"), srcN)
    val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      Versioned.replicateStreamTo(spark, srcN, "k", dstN, ckptN)
        .awaitTermination()
    }
    assert(String.valueOf(e.getMessage).contains("NULL") ||
      e.getCause != null && String.valueOf(e.getCause.getMessage)
        .contains("NULL"))
  }

  test("CDC vacuum contract: fromV = 0 is the empty anchor even after " +
      "a vacuum, but a positive vacuumed-away fromV fails LOUDLY on " +
      "every face — never a silent all-inserts re-anchor") {
    val src = "target/tmp/cdc-vacuum-anchor"
    rmDir(src)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), src) // v1
    Versioned.append(Seq((1L, "a", 11L)).toDF("k", "s", "n"), src)  // v2
    Versioned.compact(spark, src, "k")                              // v3
    Versioned.append(Seq((3L, "c", 30L)).toDF("k", "s", "n"), src)  // v4
    Versioned.compact(spark, src, "k")                              // v5
    Versioned.vacuum(spark, src, 0) // reclaims v < 5
    // fromV = 0: state before the table existed is empty BY
    // DEFINITION — vacuum can't change it; every live key is insert
    val head = Versioned.latestVersion(spark, src)
    val anchor = Versioned.changes(spark, src, "k", 0, head).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(anchor == Set((1L, "insert"), (2L, "insert"), (3L, "insert")))
    // a positive fromV whose versions were reclaimed: LOUD, both
    // kernels and the auto face
    intercept[Exception] {
      Versioned.changes(spark, src, "k", 2, head).collect()
    }
    intercept[Exception] {
      Versioned.changesIncremental(spark, src, "k", 2, head).collect()
    }
    intercept[Exception] {
      Versioned.changesAuto(spark, src, "k", 2, head).collect()
    }
  }

  test("streaming CDC classifies MERGE and NULL-key commits through " +
      "the full-kernel fallback, in-stream") {
    val src = "target/tmp/cdcstream-fb-src"
    val sink = "target/tmp/cdcstream-fb-sink"
    val ckpt = "target/tmp/cdcstream-fb-ckpt"
    Seq(src, sink, ckpt).foreach(rmDir)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), src) // v1
    Versioned.merge(Seq((1L, 99L)).toDF("k", "n"), src)             // v2
    // v3 carries a NULL key next to a real update — the incremental
    // kernel refuses; the stream must still classify the version
    val nullRow = spark.createDataFrame(
      java.util.Arrays.asList(Row(null, "x", 7L), Row(2L, "b", 21L)),
      StructType(Seq(StructField("k", LongType),
        StructField("s", StringType), StructField("n", LongType))))
    Versioned.append(nullRow, src)                                  // v3
    intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, src, "k", 2, 3)
    }
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(s"$sink/v=*")
      .select("k", "change_type", "change_version")
      .filter(col("k").isNotNull).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, "insert", 1), (2L, "insert", 1),
      (1L, "update", 2),
      (2L, "update", 3)))
  }

  test("graft_changes_auto answers through the full kernel on all " +
      "three strict-face refusals: MERGE in range, mapping change, " +
      "NULL keys; dispatches to the O(delta) kernel otherwise") {
    graft.plans.GraftExtensions.register(spark)
    def sql2(q: String): Set[(Long, String)] =
      spark.sql(q).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    // 1) MERGE in range
    val t1 = "target/tmp/cdcauto-merge"
    rmDir(t1)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), t1)
    Versioned.merge(Seq((1L, 99L)).toDF("k", "n"), t1)
    intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, t1, "k", 1, 2)
    }
    val a1 = sql2(s"SELECT k, change_type " +
      s"FROM graft_changes_auto('$t1', 'k', 1, 2)")
    assert(a1 == Set((1L, "update")))
    assert(a1 == sql2(s"SELECT k, change_type " +
      s"FROM graft_changes('$t1', 'k', 1, 2)"))
    // 2) column mapping change in range
    val t2 = "target/tmp/cdcauto-rename"
    rmDir(t2)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), t2)
    Versioned.renameColumn(spark, t2, "s", "s2")
    Versioned.append(Seq((1L, "z", 10L)).toDF("k", "s2", "n"), t2)
    intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, t2, "k", 1,
        Versioned.latestVersion(spark, t2))
    }
    val to2 = Versioned.latestVersion(spark, t2)
    val a2 = sql2(s"SELECT k, change_type " +
      s"FROM graft_changes_auto('$t2', 'k', 1, $to2)")
    assert(a2 == Set((1L, "update")))
    assert(a2 == sql2(s"SELECT k, change_type " +
      s"FROM graft_changes('$t2', 'k', 1, $to2)"))
    // 3) NULL keys in the delta (only discoverable from the probe)
    val t3 = "target/tmp/cdcauto-null"
    rmDir(t3)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), t3)
    val nullRow = spark.createDataFrame(
      java.util.Arrays.asList(Row(null, "x", 7L), Row(2L, "b", 21L)),
      StructType(Seq(StructField("k", LongType),
        StructField("s", StringType), StructField("n", LongType))))
    Versioned.append(nullRow, t3)
    intercept[IllegalArgumentException] {
      Versioned.changesIncremental(spark, t3, "k", 1, 2)
    }
    val a3 = spark.sql(s"SELECT k, change_type " +
        s"FROM graft_changes_auto('$t3', 'k', 1, 2)")
      .filter(col("k").isNotNull).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a3 == Set((2L, "update")))
    // clean range: auto must take the O(delta) kernel (the plan
    // carries the incremental face's dynamic-pruning runtime filter)
    val t4 = "target/tmp/cdcauto-clean"
    rmDir(t4)
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), t4)
    Versioned.compact(spark, t4, "k")
    Versioned.append(Seq((1L, "a", 11L)).toDF("k", "s", "n"), t4)
    val to4 = Versioned.latestVersion(spark, t4)
    val auto = Versioned.changesAuto(spark, t4, "k", to4 - 1, to4)
    assert(auto.queryExecution.executedPlan.toString
        .contains("dynamicpruning"),
      "clean range must dispatch to the incremental kernel")
    assert(auto.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "update")))
  }
}
