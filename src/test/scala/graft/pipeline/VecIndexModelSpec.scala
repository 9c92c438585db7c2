package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Seeded randomized MODEL CHECK of the generational vector index: a
 * fixed-seed random sequence of append / delete / dirty-cluster fold
 * / full-compact / RETRAIN (codebook roll + reencode) / auto-maintain
 * / vacuum ops runs against an in-memory model of the live id set;
 * after EVERY op the index's resolved live rows must equal the model
 * exactly. Maintenance and retrain are model no-ops by construction —
 * folds' carry manifests, gen-aware tombstones, the reencode, purge
 * promotion, and vacuum must never lose or resurrect a vector.
 */
class VecIndexModelSpec extends SparkSpec {
  import spark.implicits._

  private def vecsOf(ids: Seq[Long]) =
    ids.map { id =>
      id -> Array.tabulate(32) { i =>
        (((id * 31 + i * 13) % 17).toFloat - 8f) / 8f
      }
    }.toDF("id", "vec")

  test("randomized vector-index lifecycle model check: 35 seeded ops, " +
      "live ids equal the model after every op, retrains included") {
    val path = "target/tmp/vecidx-model-spec"
    val rnd = new scala.util.Random(4242L)
    val model = scala.collection.mutable.Set.empty[Long]
    var nextId = 0L
    def fresh(n: Int): Seq[Long] =
      (0 until n).map { _ => nextId += 1; nextId }

    val first = fresh(20)
    model ++= first
    val cents = vecsOf(first.take(4))
      .select(col("id").as("cid"), col("vec").as("cvec"))
    var idx = VecIndex.init(vecsOf(first), 32, path,
      centroids = Some(cents), cbBuckets = 4)
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    val cfg = graft.io.GenLog.MaintainConfig(deltaGens = 3,
      purgeFrac = 0.3)

    def check(op: String): Unit = {
      trace += op
      val got = VecIndex.liveVecs(spark, idx, Seq("id"))
        .select("id").as[Long].collect().toSet
      assert(got == model.toSet,
        s"divergence after ${trace.size} ops (${trace.takeRight(5)
          .mkString(" | ")}):\n index=$got\n model=${model.toSet}")
    }
    check("init(20)")

    (1 to 35).foreach { _ =>
      val die = rnd.nextInt(100)
      if (die < 30 || model.isEmpty) {
        val ids = fresh(1 + rnd.nextInt(6))
        idx = VecIndex.append(vecsOf(ids), idx)
        model ++= ids
        check(s"append(${ids.size})")
      } else if (die < 50) {
        val all = model.toSeq
        val victims = Seq.fill(1 + rnd.nextInt(3))(
          all(rnd.nextInt(all.size))).distinct
        idx = VecIndex.delete(victims.toDF("id"), "id", idx)
        model --= victims
        check(s"delete(${victims.size})")
      } else if (die < 65) {
        idx = VecIndex.compactIncremental(spark, idx)
        check("fold")
      } else if (die < 75) {
        idx = VecIndex.compact(spark, idx)
        check("compact")
      } else if (die < 85) {
        val acts = VecIndex.maintain(spark, idx, cfg)
        check(s"maintain(${acts.map(_._1).mkString(",")})")
      } else if (die < 93 && model.nonEmpty) {
        // codebook roll: new centroids drawn from the CURRENT live
        // set, full reencode — answers must not change
        val c2 = VecIndex.liveVecs(spark, idx, Seq("id", "vec"))
          .orderBy("id").limit(4)
          .select(col("id").as("cid"), col("vec").as("cvec"))
        idx = VecIndex.retrain(spark, idx, centroids = Some(c2))
        check("retrain")
      } else {
        VecIndex.vacuum(spark, idx)
        check("vacuum")
      }
    }
    idx = VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    check("final-compact+vacuum")
  }
}
