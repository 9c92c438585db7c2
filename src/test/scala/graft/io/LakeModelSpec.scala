package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Seeded randomized MODEL CHECK of the versioned-table lifecycle: a
 * fixed-seed random sequence of append / column-MERGE / delete /
 * compact / incremental-fold / auto-maintain / vacuum / RENAME ops
 * runs against both the real table and a trivial in-memory model;
 * after EVERY op the resolved `current()` must equal the model
 * exactly (keys, values, null-ness). Maintenance ops must never
 * change answers by construction — the model treats them as no-ops —
 * and renames swap the live column name mid-sequence, so every
 * subsequent op (including folds and maintains) runs through the
 * column-mapping machinery. A sequencing bug anywhere in the commit /
 * resolve / fold / mapping stack shows up as a concrete op trace.
 */
class LakeModelSpec extends SparkSpec {
  import spark.implicits._

  test("randomized lifecycle model check: 60 seeded ops, current() " +
      "equals the model after every op, through renames and " +
      "maintenance") {
    val p = "target/tmp/lake-model-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val rnd = new scala.util.Random(20260816L)
    val keys = 50
    // model: live key -> value (None = SQL NULL)
    val model = scala.collection.mutable.Map.empty[Long, Option[Long]]
    var valueCol = "x"
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]

    def randKeys(n: Int): Seq[Long] =
      Seq.fill(n)(rnd.nextInt(keys).toLong).distinct

    def check(op: String): Unit = {
      trace += op
      if (Versioned.latestVersion(spark, p) == 0) {
        assert(model.isEmpty, s"model non-empty before first commit")
        return
      }
      val got = Versioned.current(spark, p, "k")
        .select(col("k"), col(valueCol))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == model.toMap,
        s"divergence after ${trace.size} ops (${trace.takeRight(5)
          .mkString(" | ")}):\n table=$got\n model=${model.toMap}")
    }

    (1 to 60).foreach { i =>
      val die = rnd.nextInt(100)
      if (die < 30 || model.isEmpty) {
        // APPEND: fresh rows, latest-wins over priors
        val batch = randKeys(1 + rnd.nextInt(8)).map { k =>
          val v: Option[Long] =
            if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(1000).toLong)
          k -> v
        }
        Versioned.append(batch.map { case (k, v) =>
          (k, v.map(java.lang.Long.valueOf).orNull) }
          .toDF("k", valueCol), p)
        batch.foreach { case (k, v) => model(k) = v }
        check(s"append(${batch.size})")
      } else if (die < 50) {
        // column-level MERGE: non-null overrides, null keeps base,
        // unseen key inserts
        val batch = randKeys(1 + rnd.nextInt(6)).map { k =>
          val v: Option[Long] =
            if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(1000).toLong)
          k -> v
        }
        Versioned.merge(batch.map { case (k, v) =>
          (k, v.map(java.lang.Long.valueOf).orNull) }
          .toDF("k", valueCol), p)
        batch.foreach { case (k, v) =>
          model(k) = model.get(k) match {
            case Some(old) => if (v.isDefined) v else old
            case None => v
          }
        }
        check(s"merge(${batch.size})")
      } else if (die < 65) {
        // DELETE: tombstones, unknown keys are a no-op
        val ks = randKeys(1 + rnd.nextInt(6))
        Versioned.delete(ks.toDF("k"), p)
        ks.foreach(model.remove)
        check(s"delete(${ks.size})")
      } else if (die < 73) {
        Versioned.compact(spark, p, "k")
        check("compact")
      } else if (die < 83) {
        Versioned.compactIncremental(spark, p, "k")
        check("fold")
      } else if (die < 90) {
        val acts = Versioned.maintain(spark, p, "k",
          Versioned.MaintainConfig(deltaCommits = 3,
            targetFileBytes = 1L << 20, vacuumHorizon = 4))
        check(s"maintain(${acts.map(_._1).mkString(",")})")
      } else if (die < 95) {
        Versioned.vacuum(spark, p, 3)
        check("vacuum")
      } else {
        // RENAME the value column: every later op speaks the new name
        val to = if (valueCol == "x") "y" else "x"
        Versioned.renameColumn(spark, p, valueCol, to)
        valueCol = to
        check(s"rename->$to")
      }
    }
    assert(trace.size == 60)
    // final deep check: a full compact then vacuum must preserve the
    // model through the whole mapped history
    Versioned.compact(spark, p, "k")
    Versioned.vacuum(spark, p, 0)
    check("final-compact+vacuum")
  }
}
