package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Seeded randomized MODEL CHECK of the generation-log text index: a
 * fixed-seed random sequence of append / delete / fold / full-compact
 * / auto-maintain / vacuum ops runs against both the real index and a
 * trivial in-memory model of the live corpus; after EVERY op,
 * `searchAny` membership for a random probe term set must equal the
 * model's token-membership answer. Maintenance ops are model no-ops
 * by construction — the LSM folds, tombstone consolidation, carry
 * manifests, purge promotion, and vacuum must never change answers.
 */
class IndexModelSpec extends SparkSpec {
  import spark.implicits._

  test("randomized index lifecycle model check: 40 seeded ops, " +
      "searchAny equals the model after every op") {
    val root = "target/tmp/index-model-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val rnd = new scala.util.Random(816L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def randText(): String =
      Seq.fill(3 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val model = scala.collection.mutable.Map.empty[Long, String]
    var nextId = 0L
    def freshDocs(n: Int): Seq[(Long, String)] =
      (0 until n).map { _ => nextId += 1; (nextId, randText()) }

    val first = freshDocs(5)
    first.foreach { case (id, t) => model(id) = t }
    var idx = Search.writeIndex(first.toDF("doc_id", "text"),
      "doc_id", "text", root)
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    val cfg = graft.io.GenLog.MaintainConfig(deltaGens = 3,
      purgeFrac = 0.3)

    def check(op: String): Unit = {
      trace += op
      val probes = Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).distinct
      val got = Search.searchAny(spark, idx, probes, 1)
        .collect().map(_.getLong(0)).toSet
      val want = model.collect { case (id, t)
        if t.split(' ').exists(probes.contains) => id }.toSet
      assert(got == want,
        s"divergence after ${trace.size} ops (${trace.takeRight(5)
          .mkString(" | ")}) probing $probes:\n index=$got\n model=$want")
    }
    check("init(5)")

    (1 to 40).foreach { _ =>
      val die = rnd.nextInt(100)
      if (die < 35 || model.isEmpty) {
        val batch = freshDocs(1 + rnd.nextInt(5))
        idx = Search.append(batch.toDF("doc_id", "text"),
          "doc_id", "text", idx)
        batch.foreach { case (id, t) => model(id) = t }
        check(s"append(${batch.size})")
      } else if (die < 55) {
        val victims = Seq.fill(1 + rnd.nextInt(3))(
          model.keys.toSeq(rnd.nextInt(model.size))).distinct
        idx = Search.delete(victims.toDF("doc_id"), "doc_id", idx)
        victims.foreach(model.remove)
        check(s"delete(${victims.size})")
      } else if (die < 70) {
        idx = Search.compactIncremental(spark, idx)
        check("fold")
      } else if (die < 80) {
        idx = Search.compact(spark, idx)
        check("compact")
      } else if (die < 92) {
        val acts = Search.maintain(spark, idx, cfg)
        check(s"maintain(${acts.map(_._1).mkString(",")})")
      } else {
        Search.vacuum(spark, idx)
        check("vacuum")
      }
    }
    // closing purge: full compact + vacuum must preserve the model
    idx = Search.compact(spark, idx)
    Search.vacuum(spark, idx)
    check("final-compact+vacuum")
  }
}
