package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("rankMetrics: recall@k / reciprocal rank / nDCG@k equal the " +
      "hand-computed formulas; unjudged, resultless, and unretrieved-" +
      "relevant edge cases score the documented zeros") {
    // qid 1: ranks a(1) b(2) c(3); judged: b rel 2 (retrieved at 2),
    // x rel 1 (never retrieved)
    val results = Seq(
      (1L, "a", 3.0), (1L, "b", 2.0), (1L, "c", 1.0),
      (2L, "d", 9.0)) // qid 2 has results but no judgments
      .toDF("qid", "id", "score")
    val qrels = Seq(
      (1L, "b", 2), (1L, "x", 1),
      (3L, "z", 3)) // qid 3 judged but never served
      .toDF("qid", "id", "rel")
    val got = Eval.rankMetrics(results, qrels, k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val dcg1 = 2.0 / log2(3.0)              // b at rank 2
    val idcg1 = 2.0 / log2(2.0) + 1.0 / log2(3.0)
    assert(got(1L) == ((r6(0.5), r6(0.5), r6(dcg1 / idcg1))))
    assert(got(2L) == ((0.0, 0.0, 0.0)), "unjudged query scores zeros")
    assert(got(3L) == ((0.0, 0.0, 0.0)), "unserved query scores zeros")
    // k truncation: with k = 1 the rank-2 hit falls out entirely
    val k1 = Eval.rankMetrics(results, qrels, k = 1)
      .filter(col("qid") === 1L).collect().head
    assert((k1.getDouble(1), k1.getDouble(2), k1.getDouble(3))
      == ((0.0, 0.0, 0.0)))
    // perfect ranking: recall 1, rr 1, ndcg 1
    val perfect = Seq((9L, "p", 2.0), (9L, "q", 1.0))
      .toDF("qid", "id", "score")
    val pq = Seq((9L, "p", 3), (9L, "q", 1)).toDF("qid", "id", "rel")
    val p = Eval.rankMetrics(perfect, pq, 3).collect().head
    assert((p.getDouble(1), p.getDouble(2), p.getDouble(3))
      == ((1.0, 1.0, 1.0)))
  }

  test("hardNegatives: positives are excluded, negative ranks " +
      "densify over the survivors, n bounds the output") {
    val results = Seq(
      (1L, "a", 5.0), (1L, "b", 4.0), (1L, "c", 3.0), (1L, "d", 2.0),
      (2L, "a", 1.0))
      .toDF("qid", "id", "score")
    val qrels = Seq((1L, "b", 2), (1L, "nope", 1), (2L, "a", 0))
      .toDF("qid", "id", "rel")
    val got = Eval.hardNegatives(results, qrels, n = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet
    // qid 1: b excluded (rel 2); survivors a(1) c(2) d(3) -> top 2.
    // qid 2: judged rel 0 counts as NEGATIVE, stays.
    assert(got == Set((1L, "a", 1), (1L, "c", 2), (2L, "a", 1)))
  }
}
