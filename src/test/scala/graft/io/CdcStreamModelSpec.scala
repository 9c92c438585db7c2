package graft.io

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized STREAMING-CDC model check: seeded commit ops (appends
  * with occasional NULL keys, deletes, column MERGEs, compacts)
  * interleaved with stream runs against ONE checkpoint — after every
  * stream run the accumulated feed must equal the batch kernel's
  * per-version union (computed independently at the end of time),
  * with zero duplicates, and folding the feed must reproduce the
  * current key set. Vacuum runs only after a stream drained (the
  * documented source contract); the feed must survive it. */
class CdcStreamModelSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType),
    StructField("s", StringType), StructField("n", LongType)))

  private def feed(sink: String): Seq[(Option[Long], String, Int)] = {
    val vs = Versioned.versions(spark, sink)
    if (vs.isEmpty) return Nil
    spark.read.parquet(vs.map(v => s"$sink/v=$v"): _*)
      .select("k", "change_type", "change_version").collect().toSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getInt(2)))
  }

  test("randomized commit mix + interleaved stream runs: feed == " +
      "per-version batch union, exactly once, through MERGE/NULL-key " +
      "fallbacks, compacts, and a post-drain vacuum") {
    val src = "target/tmp/cdcstream-model-src"
    val sink = "target/tmp/cdcstream-model-sink"
    val ckpt = "target/tmp/cdcstream-model-ckpt"
    Seq(src, sink, ckpt).foreach { p =>
      val f = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(p), true)
    }
    val rnd = new Random(16)
    var live = Set.empty[Long] // which keys exist (for delete picks)
    def rows(n: Int, withNull: Boolean): java.util.List[Row] = {
      val rs = (0 until n).map { _ =>
        val k = rnd.nextInt(10).toLong
        live += k
        Row(k, s"s${rnd.nextInt(5)}", rnd.nextInt(100).toLong)
      } ++ (if (withNull) Seq(Row(null, "nul", 0L)) else Nil)
      java.util.Arrays.asList(rs: _*)
    }
    def append(withNull: Boolean): Unit = {
      Versioned.append(spark.createDataFrame(
        rows(1 + rnd.nextInt(3), withNull), schema), src)
      ()
    }
    append(withNull = false) // v1 fixes the stream schema
    var streamRuns = 0
    (0 until 24).foreach { i =>
      rnd.nextInt(7) match {
        case 0 | 1 => append(withNull = false)
        case 2 => append(withNull = true) // NULL-key fallback in-stream
        case 3 => // column MERGE — the other full-kernel fallback
          if (live.nonEmpty) {
            val k = live.toSeq(rnd.nextInt(live.size))
            Versioned.merge(Seq((k, rnd.nextInt(100).toLong))
              .toDF("k", "n"), src)
          }
        case 4 => // delete an existing key
          if (live.nonEmpty) {
            val k = live.toSeq(rnd.nextInt(live.size))
            live -= k
            Versioned.delete(Seq(k).toDF("k"), src)
          }
        case 5 => // compact: a checkpoint the stream must NOT re-emit
          Versioned.compact(spark, src, "k")
        case 6 => // stream run (possibly after several quiet ones)
          Versioned.changesStreamTo(spark, src, "k", sink, ckpt)
            .awaitTermination()
          streamRuns += 1
          if (rnd.nextBoolean()) { // post-drain vacuum: feed survives
            Versioned.vacuum(spark, src, 0)
          }
      }
    }
    // final drain so the feed covers every committed version
    Versioned.changesStreamTo(spark, src, "k", sink, ckpt)
      .awaitTermination()
    assert(streamRuns > 0, "seed must exercise interleaved runs")
    val got = feed(sink)
    assert(got.size == got.toSet.size, "duplicate change rows")
    // independent expectation: the batch kernel per version. The
    // stream classified v against v-1 AT DELIVERY TIME; a later
    // vacuum can make that range unreadable for the batch replay, so
    // compare against the per-version union over the versions still
    // replayable — and check the others arrived by count bookkeeping
    // of the feed itself (set equality on the replayable slice).
    val head = Versioned.latestVersion(spark, src)
    val base = Versioned.versions(spark, src).min
    val expected = ((base + 1) to head).flatMap { v =>
      Versioned.changesAuto(spark, src, "k", v - 1, v).collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getString(1), v))
    }.toSet
    val gotReplayable = got.filter(_._3 > base).toSet
    assert(gotReplayable == expected,
      s"feed diverged from the batch kernel on the replayable range " +
        s"($base, $head]")
    // fold the WHOLE feed: latest change per key (NULL keys excluded —
    // they never resolve) minus deletes == current key set
    val folded = got.filter(_._1.isDefined)
      .groupBy(_._1.get).map { case (k, cs) => k -> cs.maxBy(_._3)._2 }
      .collect { case (k, ct) if ct != "delete" => k }.toSet
    val current = Versioned.current(spark, src, "k")
      .filter(col("k").isNotNull)
      .select("k").as[Long].collect().toSet
    assert(folded == current,
      s"feed fold $folded != current $current")
  }
}
