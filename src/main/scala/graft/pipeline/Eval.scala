package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * OFFLINE RETRIEVAL EVALUATION — the measurement loop every serving
 * stack runs against its indexes (and the reason the batched serves
 * exist: score thousands of queries, grade them against labeled
 * qrels, track the metrics per index/codebook generation):
 *
 *  - recall@k, reciprocal rank (MRR's per-query term), and nDCG@k
 *    per query, from a `(qid, id, score)` results frame and a
 *    `(qid, id, rel)` graded-judgment frame (TREC qrels shape);
 *  - hard-negative mining: the top-ranked NON-relevant candidates
 *    per query — the training-data op that turns a serve into
 *    contrastive training pairs (dense-retriever fine-tuning mines
 *    negatives from the current index exactly this way).
 *
 * Everything is declarative and qid-partitioned: one rank window
 * over the results (candidate-list-sized, never corpus-sized), one
 * join against the qrels on (qid, id), per-qid aggregates. Metrics
 * round to 6 before any downstream rank so an independent engine
 * reproduces them exactly (the DuckDB oracle replays every formula).
 *
 * Definitions (standard IR):
 *  - rank: 1-based position under (score desc, id asc) — the same
 *    deterministic tie-break every serve here uses;
 *  - recall@k = |relevant ∩ top-k| / |relevant| (graded judgments
 *    count as relevant when rel > 0);
 *  - rr = 1 / rank of the first relevant result, 0 when none
 *    retrieved (mean over queries = MRR);
 *  - nDCG@k = DCG@k / IDCG@k with DCG = Σ_{i<=k} rel_i / log2(i+1)
 *    (Järvelin & Kekäläinen's discounted cumulative gain; IDCG from
 *    the query's own judgments sorted by rel desc, capped at k);
 *    0 when the query has no judgments.
 */
object Eval {

  private def log2(c: org.apache.spark.sql.Column) =
    log(c) / math.log(2.0)

  /** Per-query metrics: `(qid, recall_k, rr, ndcg_k)` — one row per
    * qid present in EITHER frame (a query with judgments but no
    * results scores 0s; a query with results but no judgments scores
    * 0s with null-safe arithmetic). Mean the columns for the corpus
    * summary (MRR = mean rr). */
  def rankMetrics(results: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("id").asc)
    val ranked = results.select(col("qid"), col("id"), col("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val rel = qrels.select(col("qid"), col("id"),
      col("rel").cast("double").as("rel"))
    // hits: retrieved top-k rows with their (possibly absent) grade
    val hits = ranked.join(rel, Seq("qid", "id"), "left_outer")
      .withColumn("rel", coalesce(col("rel"), lit(0.0)))
    val perQ = hits.groupBy("qid").agg(
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("__hits"),
      coalesce(min(when(col("rel") > 0, col("rank"))), lit(0L))
        .as("__frst"),
      sum(col("rel") / log2(col("rank") + 1.0)).as("__dcg"))
    // per-query totals from the judgments alone: |relevant| and
    // IDCG@k (the query's own grades, best-first, capped at k)
    val wr = Window.partitionBy("qid").orderBy(col("rel").desc,
      col("id").asc)
    val ideal = rel.filter(col("rel") > 0)
      .withColumn("__irk", row_number().over(wr))
      .groupBy("qid").agg(
        count(lit(1)).as("__nrel"),
        sum(when(col("__irk") <= k,
          col("rel") / log2(col("__irk") + 1.0))
          .otherwise(lit(0.0))).as("__idcg"))
    perQ.join(ideal, Seq("qid"), "full_outer")
      .select(col("qid"),
        round(coalesce(col("__hits"), lit(0L)) /
          coalesce(col("__nrel"), lit(Long.MaxValue)), 6)
          .as("recall_k"),
        round(when(coalesce(col("__frst"), lit(0L)) > 0,
          lit(1.0) / col("__frst")).otherwise(lit(0.0)), 6).as("rr"),
        round(
          when(coalesce(col("__idcg"), lit(0.0)) > 0,
            coalesce(col("__dcg"), lit(0.0)) / col("__idcg"))
            .otherwise(lit(0.0)), 6).as("ndcg_k"))
  }

  /** CORPUS SUMMARY: one row aggregating [[rankMetrics]] over every
    * query — `(n_queries, mean_recall_k, mrr, mean_ndcg_k)` — the
    * number a retrieval dashboard tracks per index generation. Means
    * are computed as EXACT decimal sums of the (already-rounded-to-6)
    * per-query metrics divided once in double and rounded to 6:
    * double summation order differs between engines (Spark partial
    * aggregates vs a single-threaded replay), and a last-ulp
    * difference under a plain `avg` could shift the 6th decimal —
    * the decimal sum makes the mean bit-reproducible anywhere. */
  def summary(results: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    val per = rankMetrics(results, qrels, k)
    def mean(c: String, as: String) =
      round(sum(col(c).cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as(as)
    per.agg(count(lit(1)).as("n_queries"),
      mean("recall_k", "mean_recall_k"),
      mean("rr", "mrr"),
      mean("ndcg_k", "mean_ndcg_k"))
  }

  /** HARD NEGATIVES: per query, the `n` best-ranked results that are
    * NOT relevant (rel absent or 0 in the qrels) — the contrastive
    * training pairs a dense retriever mines from its own index.
    * Returns `(qid, id, neg_rank)` with `neg_rank` densified over
    * the negatives (1 = hardest). Candidate-list-sized throughout. */
  def hardNegatives(results: DataFrame, qrels: DataFrame,
      n: Int): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("id").asc)
    val positives = qrels.filter(col("rel") > 0).select("qid", "id")
    results.select(col("qid"), col("id"), col("score"))
      .join(positives, Seq("qid", "id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= n)
      .select("qid", "id", "neg_rank")
  }
}
