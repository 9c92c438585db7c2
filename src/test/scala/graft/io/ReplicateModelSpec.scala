package graft.io

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized STREAMING-REPLICATION model check: seeded commit ops
  * (appends, upserts, deletes, compacts on the SOURCE, maintenance on
  * the REPLICA) interleaved with capped replication runs against ONE
  * checkpoint — after every drained run, `current(replica)` must
  * equal both the in-memory model and `current(src)` exactly; replica
  * commits must stay one-row-per-key-per-epoch; replica-side
  * compaction/vacuum must never change answers or break the resume. */
class ReplicateModelSpec extends SparkSpec {
  import spark.implicits._

  test("randomized commit mix + interleaved capped replication runs: " +
      "replica current == source current == model after every drain, " +
      "through source compacts and replica maintenance") {
    val src = "target/tmp/repl-model-src"
    val dst = "target/tmp/repl-model-dst"
    val ckpt = "target/tmp/repl-model-ckpt"
    Seq(src, dst, ckpt).foreach { p =>
      val f = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(p), true)
    }
    val rnd = new Random(20260816L)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    // the replica's EXPECTED state: the model as of the last drain
    // (commits between drains legitimately lag)
    var lastDrained = Map.empty[Long, Long]
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    var drains = 0
    def cur(p: String): Map[Long, Long] =
      if (Versioned.latestVersion(spark, p) == 0) Map.empty
      else Versioned.current(spark, p, "k").select("k", "x")
        .as[(Long, Long)].collect().toMap
    def drain(op: String): Unit = {
      Versioned.replicateStreamTo(spark, src, "k", dst, ckpt,
        maxVersionsPerTrigger = 1 + rnd.nextInt(3)).awaitTermination()
      drains += 1
      lastDrained = model.toMap
      trace += op
      assert(cur(dst) == model.toMap,
        s"replica diverged from the model after " +
          s"[${trace.mkString(" -> ")}]")
      assert(cur(dst) == cur(src),
        s"replica diverged from the source after " +
          s"[${trace.mkString(" -> ")}]")
    }
    // seed version so the stream has a schema source
    Versioned.append(Seq((1L, 10L)).toDF("k", "x"), src)
    model(1L) = 10L
    drain("seed")
    for (i <- 1 to 18) rnd.nextInt(7) match {
      case 0 | 1 => // append/upsert a small batch
        val rows = (1 to 1 + rnd.nextInt(3)).map { _ =>
          (1L + rnd.nextInt(9), rnd.nextInt(100).toLong)
        }.groupBy(_._1).map(_._2.head).toSeq
        Versioned.append(rows.toDF("k", "x"), src)
        rows.foreach { case (k, x) => model(k) = x }
        trace += s"append($rows)"
      case 2 => // delete a live key
        if (model.nonEmpty) {
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          Versioned.delete(Seq(k).toDF("k"), src)
          model.remove(k)
          trace += s"delete($k)"
        }
      case 3 => // drain whatever is pending under a random cap
        drain(s"drain#$i")
      case 4 => // source compact (checkpoints are planning-excluded
        // for a RESUMED stream — answers must not change)
        if (Versioned.latestVersion(spark, src) > 0) {
          Versioned.compact(spark, src, "k")
          trace += "compact(src)"
        }
      case 5 => // replica-side maintenance between drains
        if (Versioned.latestVersion(spark, dst) > 0) {
          Versioned.compact(spark, dst, "k")
          Versioned.vacuum(spark, dst, 0)
          trace += "maintain(dst)"
          assert(cur(dst) == lastDrained,
            s"replica maintenance changed answers after " +
              s"[${trace.mkString(" -> ")}]")
        }
      case _ => // MERGE overlay (insert-on-absent semantics): the
        // merge-bearing epoch must restate through the source resolve
        val k = 1L + rnd.nextInt(9)
        val x = rnd.nextInt(100).toLong
        Versioned.merge(Seq((k, x)).toDF("k", "x"), src)
        model(k) = x
        trace += s"merge($k -> $x)"
    }
    drain("final")
    assert(drains >= 3 && trace.exists(_.startsWith("append")) &&
      trace.exists(_.startsWith("merge")), s"trace: $trace")
    // every replica epoch folded to at most one row per key
    Versioned.versions(spark, dst).foreach { v =>
      val dup = spark.read.parquet(s"$dst/v=$v")
        .groupBy("k").count().filter(col("count") > 1).count()
      assert(dup == 0, s"replica v=$v carries a duplicate key")
    }
  }
}
