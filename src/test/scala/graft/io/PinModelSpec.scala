package graft.io

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized READER-PIN lifecycle model check: seeded ops (appends,
  * compacts, pins at the head, releases, full-horizon vacuums)
  * against a key-value model. The invariants, checked after every
  * op where they apply:
  *  - an in-flight frame built at a pinned version keeps collecting
  *    its EXACT snapshot through any number of later vacuums;
  *  - expired pins are auto-released by vacuum; held pins never are;
  *  - current() always equals the model;
  *  - after releasing everything + one more vacuum, no markerless
  *    version remnants remain and reads below the base fail loudly. */
class PinModelSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(df: DataFrame): Map[Long, Long] =
    df.select("k", "x").as[(Long, Long)].collect().toMap

  test("randomized pin lifecycle: 30 seeded ops, pinned in-flight " +
      "reads survive every vacuum, expired pins release, remnants " +
      "drain") {
    // zero the lease clock-skew slack so 1 ms leases expire in-test
    spark.conf.set("spark.graft.pinLeaseSlackMs", "0")
    val path = "target/tmp/pin-model"
    Versioned.drop(spark, path)
    val rnd = new Random(20260816)
    // model: committed state per version (latest wins per key)
    var state = Map.empty[Long, Long]
    val states = mutable.Map.empty[Int, Map[Long, Long]] // version -> state
    var nextPin = 0
    // active pins: name -> (pinned version, its expected snapshot,
    // the in-flight frame built when the pin was taken)
    val pins = mutable.Map.empty[String, (Int, Map[Long, Long], DataFrame)]
    def commitSeen(v: Int): Unit = { states(v) = state; () }

    // v1 so pins/compacts always have something
    state = Map(1L -> 10L, 2L -> 20L)
    commitSeen(Versioned.append(state.toSeq.toDF("k", "x"), path))

    (0 until 30).foreach { i =>
      rnd.nextInt(6) match {
        case 0 | 1 => // append (upserts + fresh keys)
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong)
          }
          state = state ++ rows.toMap
          commitSeen(Versioned.append(rows.toDF("k", "x"), path))
        case 2 => // delete an existing key (if any)
          if (state.nonEmpty) {
            val k = state.keys.toSeq(rnd.nextInt(state.size))
            state = state - k
            commitSeen(Versioned.delete(Seq(k).toDF("k"), path))
          }
        case 3 => // compact (the checkpoint a vacuum will cut to)
          commitSeen(Versioned.compact(spark, path, "k"))
        case 4 => // pin the head + build the in-flight frame
          val v = Versioned.latestVersion(spark, path)
          val name = s"reader-$nextPin"; nextPin += 1
          assert(Versioned.pinSnapshot(spark, path, v, name,
            leaseMs = 3600000L) > 0)
          pins(name) = (v,
            states(v),
            Versioned.currentAsOf(spark, path, "k", v).select("k", "x"))
        case 5 => // vacuum: held pins' frames must keep reading exact
          // an EXPIRED pin rides along to prove auto-release
          val v = Versioned.latestVersion(spark, path)
          Versioned.pinSnapshot(spark, path, v, s"expired-$i", 1L)
          Thread.sleep(5)
          Versioned.vacuum(spark, path, 0)
          assert(Versioned.clonePins(spark, path)
            .filter(col("clone") === s"pin:expired-$i").count() == 0,
            "expired pin must auto-release")
          pins.foreach { case (name, (v0, want, df)) =>
            assert(snapshot(df) == want,
              s"op $i: pinned frame at v=$v0 ($name) lost rows " +
                "after vacuum")
          }
          // release a random held pin (collect one last time first)
          if (pins.nonEmpty) {
            val name = pins.keys.toSeq(rnd.nextInt(pins.size))
            val (_, want, df) = pins(name)
            assert(snapshot(df) == want)
            assert(Versioned.releasePin(spark, path, name) > 0)
            pins.remove(name)
          }
      }
      assert(snapshot(Versioned.current(spark, path, "k")) == state,
        s"op $i: current diverged from the model")
    }
    // drain: last reads, release everything, vacuum, no remnants
    pins.foreach { case (name, (_, want, df)) =>
      assert(snapshot(df) == want)
      Versioned.releasePin(spark, path, name)
    }
    Versioned.compact(spark, path, "k")
    Versioned.vacuum(spark, path, 0)
    assert(new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .forall(d => new java.io.File(d, "_SUCCESS").exists()),
      "markerless pin remnants must drain once released")
    assert(snapshot(Versioned.current(spark, path, "k")) == state)
    assert(Versioned.clonePins(spark, path).count() == 0)
  }
}
