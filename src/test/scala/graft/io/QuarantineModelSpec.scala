package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Seeded randomized MODEL CHECK of the dead-letter ingest lifecycle:
 * a fixed-seed sequence of checked-quarantine batch appends (fresh
 * batch ids, EXACT REPLAYS of earlier batches, all-clean and all-bad
 * batches), key deletes, and maintenance (compact / vacuum on either
 * table) runs against both the real pair of tables and a trivial
 * in-memory model; after EVERY op the resolved `current()` of the
 * MAIN table and of the QUARANTINE table must equal the model
 * exactly. Replays must change nothing on either side (the
 * `_BATCH_<ingest>_<id>` marker is per TABLE, and a batch whose rows
 * all diverted commits on only one side — the replay must still skip
 * BOTH), and maintenance must never change answers. A split bug, a
 * double-applied replay, or a marker lost by compact/vacuum shows up
 * as a concrete op trace.
 */
class QuarantineModelSpec extends SparkSpec {
  import spark.implicits._

  test("randomized dead-letter ingest model check: 30 seeded ops, " +
      "main and quarantine currents equal the model after every op, " +
      "replays and maintenance change nothing") {
    val root = "target/tmp/quar-model-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val main = s"$root/main"
    val quar = s"$root/quar"
    val rnd = new scala.util.Random(20260816L)
    val keys = 40
    // the declared checks: x must be positive, k must stay below 900
    val checks = Seq(
      ("x_pos", col("x") > 0L),
      ("k_small", col("k") < 900L))
    def violated(k: Long, x: Long): Seq[String] =
      (if (x <= 0) Seq("x_pos") else Nil) ++
        (if (k >= 900) Seq("k_small") else Nil)

    // models: key -> latest value (main), key -> (x, reasons, batch)
    val mModel = scala.collection.mutable.Map.empty[Long, Long]
    val qModel = scala.collection.mutable.Map.empty[Long, (Long, String, Long)]
    // batches already ingested, for exact replays: id -> rows
    val batches = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long)]]
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]

    def check(op: String): Unit = {
      trace += op
      val gotM =
        if (Versioned.latestVersion(spark, main) == 0) Map.empty
        else Versioned.current(spark, main, "k").select("k", "x")
          .as[(Long, Long)].collect().toMap
      assert(gotM == mModel.toMap,
        s"MAIN diverged after [${trace.mkString(" -> ")}]:\n" +
          s"got $gotM\nwant $mModel")
      val gotQ =
        if (Versioned.latestVersion(spark, quar) == 0) Map.empty
        else Versioned.current(spark, quar, "k")
          .select("k", "x", "q_violated", "q_batch")
          .as[(Long, Long, String, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(gotQ == qModel.toMap,
        s"QUARANTINE diverged after [${trace.mkString(" -> ")}]:\n" +
          s"got $gotQ\nwant $qModel")
    }

    def ingest(rows: Seq[(Long, Long)], id: Long, replay: Boolean): Unit = {
      Versioned.appendCheckedQuarantine(rows.toDF("k", "x"), main,
        checks, quar, batchId = id, ingestId = "model")
      if (!replay) rows.foreach { case (k, x) =>
        val v = violated(k, x)
        if (v.isEmpty) mModel(k) = x
        else qModel(k) = ((x, v.mkString(","), id))
      }
    }

    var nextId = 0L
    (1 to 30).foreach { i =>
      rnd.nextInt(10) match {
        case n if n <= 4 => // fresh batch, mixed rows (maybe all-one-kind)
          val mode = rnd.nextInt(3) // 0 mixed, 1 all-clean, 2 all-bad
          val rows = Seq.fill(1 + rnd.nextInt(12)) {
            val k = mode match {
              case 1 => rnd.nextInt(800).toLong
              case 2 => 900L + rnd.nextInt(keys)
              case _ => rnd.nextInt(1000).toLong
            }
            val x = if (mode == 2) -rnd.nextInt(5).toLong
              else rnd.nextInt(50).toLong - (if (mode == 1) 0 else 5)
          (k, x)
          }.groupBy(_._1).map(_._2.last).toSeq // one row per key per batch
          val id = nextId; nextId += 1
          batches(id) = rows
          ingest(rows, id, replay = false)
          check(s"ingest#$id(${rows.size})")
        case 5 | 6 if batches.nonEmpty => // exact replay: must skip BOTH
          val id = batches.keys.toSeq(rnd.nextInt(batches.size))
          ingest(batches(id), id, replay = true)
          check(s"replay#$id")
        case 7 if mModel.nonEmpty => // delete on the main table
          val ks = mModel.keys.toSeq.sorted
            .take(1 + rnd.nextInt(3)).toSeq
          Versioned.delete(ks.toDF("k"), main)
          ks.foreach(mModel.remove)
          check(s"delete(${ks.size})")
        case 8 => // maintenance on main: compact then vacuum
          if (Versioned.latestVersion(spark, main) > 0) {
            Versioned.compact(spark, main, "k")
            Versioned.vacuum(spark, main, 0)
          }
          check("compact+vacuum(main)")
        case _ => // maintenance on the quarantine table
          if (Versioned.latestVersion(spark, quar) > 0) {
            Versioned.compact(spark, quar, "k")
            Versioned.vacuum(spark, quar, 0)
          }
          check("compact+vacuum(quar)")
      }
    }
    // the run must have exercised every op kind
    assert(trace.exists(_.startsWith("ingest")) &&
      trace.exists(_.startsWith("replay")) &&
      trace.exists(_.startsWith("compact")), s"trace: $trace")
  }

  test("replayQuarantine: divert -> fix -> replay lands each dead " +
      "letter in main exactly once and drains the quarantine; replay " +
      "of the replay no-ops; a torn replay heals without doubling; a " +
      "fix that leaves violations refuses with nothing committed") {
    import org.apache.spark.sql.DataFrame
    val root = "target/tmp/quar-replay-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val main = s"$root/main"
    val quar = s"$root/quar"
    val checks = Seq(("x_pos", col("x") > 0L))
    def fix(df: DataFrame): DataFrame = df.withColumn("x", abs(col("x")))
    def curM: Map[Long, Long] =
      Versioned.current(spark, main, "k").select("k", "x")
        .as[(Long, Long)].collect().toMap
    def liveQ: Long = Versioned.current(spark, quar, "k").count()
    def logCountPerKey: Map[Long, Long] = Versioned
      .asOf(spark, main, Versioned.latestVersion(spark, main))
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    // divert: evens fail x_pos
    val rows = (1L to 6L).map(k => (k, if (k % 2 == 0) -k else k))
      .toDF("k", "x")
    Versioned.appendCheckedQuarantine(rows, main, checks, quar,
      batchId = 1L)
    assert(curM == Map(1L -> 1L, 3L -> 3L, 5L -> 5L) && liveQ == 3)
    // replay: corrected rows land once, quarantine drains
    assert(Versioned.replayQuarantine(spark, quar, main, "k", checks,
      fix).nonEmpty)
    assert(curM == (1L to 6L).map(k => k -> k).toMap && liveQ == 0)
    assert(logCountPerKey.values.forall(_ == 1L),
      s"each key must land exactly once: $logCountPerKey")
    // replay of the replay: no-op
    assert(Versioned.replayQuarantine(spark, quar, main, "k", checks,
      fix).isEmpty)
    assert(curM.size == 6 && logCountPerKey.values.forall(_ == 1L))
    // a later divert opens a new window
    Versioned.appendCheckedQuarantine(Seq((7L, -7L)).toDF("k", "x"),
      main, checks, quar, batchId = 2L)
    assert(Versioned.replayQuarantine(spark, quar, main, "k", checks,
      fix).nonEmpty)
    assert(curM(7L) == 7L && liveQ == 0)
    // TORN replay: land ONLY the main side under the pair marker (the
    // crash window between the two commits), then heal
    Versioned.appendCheckedQuarantine(Seq((9L, -9L)).toDF("k", "x"),
      main, checks, quar, batchId = 3L)
    val qv = Versioned.latestVersion(spark, quar)
    val hconf = spark.sparkContext.hadoopConfiguration
    val qp = new org.apache.hadoop.fs.Path(quar)
    val ingest = "rq" + java.security.MessageDigest.getInstance("MD5")
      .digest(qp.getFileSystem(hconf).makeQualified(qp).toString
        .getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    Versioned.appendBatch(
      fix(Versioned.current(spark, quar, "k")
        .drop("q_violated", "q_batch")), main, qv, ingest)
    assert(curM(9L) == 9L && liveQ == 1, "torn: main landed, drain did not")
    assert(Versioned.replayQuarantine(spark, quar, main, "k", checks,
      fix).nonEmpty, "heal must complete the drain")
    assert(liveQ == 0 && logCountPerKey(9L) == 1L,
      "heal must not double-land the torn window")
    // a fix that leaves violations: loud, nothing committed
    Versioned.appendCheckedQuarantine(Seq((10L, -10L)).toDF("k", "x"),
      main, checks, quar, batchId = 4L)
    val e = intercept[IllegalArgumentException] {
      Versioned.replayQuarantine(spark, quar, main, "k", checks,
        df => df) // identity: still violating
    }
    assert(e.getMessage.contains("x_pos"))
    assert(!curM.contains(10L) && liveQ == 1,
      "refused replay must leave both tables untouched")
    assert(Versioned.replayQuarantine(spark, quar, main, "k", checks,
      fix).nonEmpty) // clear k=10 so the next scenario starts drained
    // TORN replay + SAME-KEY RE-DIVERT before the heal: the heal's
    // drain must NOT swallow the newer dead letter — it stays live,
    // the next window replays it, and its payload supersedes the torn
    // landing
    Versioned.appendCheckedQuarantine(Seq((11L, -11L)).toDF("k", "x"),
      main, checks, quar, batchId = 5L)
    val qv2 = Versioned.latestVersion(spark, quar)
    Versioned.appendBatch(
      fix(Versioned.current(spark, quar, "k")
        .drop("q_violated", "q_batch")), main, qv2, ingest)
    assert(curM(11L) == 11L, "torn: old payload landed")
    Versioned.appendCheckedQuarantine(Seq((11L, -111L)).toDF("k", "x"),
      main, checks, quar, batchId = 6L)
    assert(Versioned.replayQuarantine(spark, quar, main, "k", checks,
      fix).nonEmpty)
    assert(curM(11L) == 111L,
      "the re-diverted newer payload must supersede the torn landing")
    assert(liveQ == 0, "both dead-letter versions drained in the end")
  }

  test("seeded replay-lifecycle model check: random diverts, replays, " +
      "torn replays, and maintenance — main and quarantine currents " +
      "equal the model after every op") {
    import org.apache.spark.sql.DataFrame
    val root = "target/tmp/quar-replay-model"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val main = s"$root/main"
    val quar = s"$root/quar"
    val checks = Seq(("x_pos", col("x") > 0L))
    def fix(df: DataFrame): DataFrame = df.withColumn("x", abs(col("x")))
    val hconf = spark.sparkContext.hadoopConfiguration
    val qp = new org.apache.hadoop.fs.Path(quar)
    lazy val ingest = "rq" + java.security.MessageDigest.getInstance("MD5")
      .digest(qp.getFileSystem(hconf).makeQualified(qp).toString
        .getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    val rnd = new scala.util.Random(20260817L)
    val mModel = scala.collection.mutable.Map.empty[Long, Long]
    val qModel = scala.collection.mutable.Map.empty[Long, Long]
    var tornPending = false
    // what the torn attempt landed (its marker makes the heal SKIP
    // re-landing these — a clean same-key write after the torn landing
    // must survive the heal)
    var tornSnap = Map.empty[Long, Long]
    var batchId = 0L
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(op: String): Unit = {
      trace += op
      def cur(p: String): Map[Long, Long] =
        if (Versioned.latestVersion(spark, p) == 0) Map.empty
        else Versioned.current(spark, p, "k").select("k", "x")
          .as[(Long, Long)].collect().toMap
      assert(cur(main) == mModel.toMap,
        s"MAIN diverged after [${trace.mkString(" -> ")}]")
      assert(cur(quar) == qModel.toMap,
        s"QUAR diverged after [${trace.mkString(" -> ")}]")
    }
    for (i <- 1 to 24) rnd.nextInt(7) match {
      case 0 | 1 | 2 => // divert a mixed batch
        val rows = (1 to 1 + rnd.nextInt(3)).map { _ =>
          val k = 1L + rnd.nextInt(12)
          val x = (1L + rnd.nextInt(50)) * (if (rnd.nextBoolean()) 1 else -1)
          (k, x)
        }.distinct.groupBy(_._1).map(_._2.head).toSeq // one row per key
        batchId += 1
        Versioned.appendCheckedQuarantine(rows.toDF("k", "x"), main,
          checks, quar, batchId)
        rows.foreach { case (k, x) =>
          if (x > 0) mModel(k) = x else qModel(k) = x
        }
        check(s"divert($rows)")
      case 3 => // replay (heals a torn window too): dead letters the
        // torn attempt already landed (same key, same payload) are
        // marker-skipped — only re-diverted/new ones land now
        val r = Versioned.replayQuarantine(spark, quar, main, "k",
          checks, fix)
        if (qModel.isEmpty && !tornPending) assert(r.isEmpty)
        qModel.foreach { case (k, x) =>
          if (!(tornPending && tornSnap.get(k).contains(x)))
            mModel(k) = math.abs(x)
        }
        qModel.clear(); tornPending = false; tornSnap = Map.empty
        check("replay")
      case 4 => // TORN replay: main lands, drain doesn't
        if (qModel.nonEmpty && !tornPending) {
          val qv = Versioned.latestVersion(spark, quar)
          Versioned.appendBatch(
            fix(Versioned.current(spark, quar, "k")
              .drop("q_violated", "q_batch")), main, qv, ingest)
          qModel.foreach { case (k, x) => mModel(k) = math.abs(x) }
          tornPending = true; tornSnap = qModel.toMap
          check("torn")
        }
      case 5 => // maintenance on main
        if (Versioned.latestVersion(spark, main) > 0) {
          Versioned.compact(spark, main, "k")
          Versioned.vacuum(spark, main, 0)
          check("compact+vacuum(main)")
        }
      case _ => // maintenance on the quarantine: compact always; a
        // vacuum would reclaim a pending torn window's resolve point
        // (replay-before-vacuum is the documented contract)
        if (Versioned.latestVersion(spark, quar) > 0) {
          Versioned.compact(spark, quar, "k")
          if (!tornPending) Versioned.vacuum(spark, quar, 0)
          check("compact(quar)")
        }
    }
    // drain whatever is left and confirm the final fold
    Versioned.replayQuarantine(spark, quar, main, "k", checks, fix)
    qModel.foreach { case (k, x) => mModel(k) = math.abs(x) }
    qModel.clear()
    check("final-replay")
    assert(trace.exists(_.startsWith("divert")) &&
      trace.contains("replay") && trace.contains("torn"), s"$trace")
  }
}
