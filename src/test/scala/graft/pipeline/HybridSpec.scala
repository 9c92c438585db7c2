package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("RRF fusion arithmetic: agreement across lists beats " +
      "single-list dominance; absent-from-a-list contributes zero; " +
      "ranks and ties are deterministic") {
    val lex = Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).toDF("id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.8), (1L, 0.7)).toDF("nid", "cos")
    val got = Hybrid.rrf(
        Seq((lex, "id", "score"), (sem, "nid", "cos")), k0 = 60,
        topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def f(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      1L -> f(1, 3), // lex rank 1, sem rank 3
      2L -> f(2, 1), // in BOTH lists: fused above every single-list id
      3L -> f(3),
      4L -> f(2)))
    assert(got(2L) > got(1L) && got(1L) > got(4L) && got(4L) > got(3L))
    // topK truncation by (rrf desc, id asc)
    val top2 = Hybrid.rrf(
        Seq((lex, "id", "score"), (sem, "nid", "cos")), 60, 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(1L, 2L))
  }

  private def corpus(ids: Range): DataFrame =
    ids.map { id =>
      id.toLong -> Array.tabulate(64) { i =>
        (((id * 31 + i * 13) % 17).toFloat - 8f) / 8f
      }
    }.toDF("id", "vec")

  test("hybridTopK composes the two pruned serves; a metadata filter " +
      "binds BOTH sides — no violating id ever surfaces, semantic " +
      "top-k stays full among matching rows") {
    val docs = (0 until 40).map { id =>
      val toks = if (id % 2 == 0) "alpha beta gamma" else "alpha delta"
      (id.toLong, s"$toks doc$id")
    }.toDF("doc_id", "text")
    val sIdx = Search.writeIndex(docs, "doc_id", "text",
      "target/tmp/hybrid-text")
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val tagged = corpus(0 until 40).withColumn("lang",
      when(pmod(col("id"), lit(3)) === 0, "en").otherwise("xx"))
    val vIdx = VecIndex.init(tagged, 64, "target/tmp/hybrid-vec",
      centroids = Some(cents), cbBuckets = 2)
    val qv = corpus(100 until 101) // non-corpus id: nothing self-excluded
    val terms = Seq("alpha", "beta")
    // unfiltered: equals the manual composition
    val got = Hybrid.hybridTopK(spark, sIdx, vIdx, terms, qv,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val manual = Hybrid.rrf(Seq(
        (Search.searchBm25(spark, sIdx, terms, topK = 10), "id", "score"),
        (VecIndex.ivfTopK(spark, qv, vIdx, 4, 10), "nid", "cos")),
        60, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == manual && got.nonEmpty)
    // filtered: every surfaced id satisfies the predicate — including
    // ids that only the LEXICAL list surfaced
    val filtered = Hybrid.hybridTopK(spark, sIdx, vIdx, terms, qv,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8,
        filter = Some(col("lang") === "en"))
      .collect().map(_.getLong(0))
    assert(filtered.nonEmpty && filtered.forall(_ % 3 == 0),
      s"violating ids surfaced: ${filtered.toSeq}")
  }
}
