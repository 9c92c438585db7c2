package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * HYBRID retrieval: lexical (BM25 over the [[Search]] inverted index)
 * and semantic (cosine over the [[VecIndex]] generational ANN index)
 * candidates fused by RECIPROCAL RANK FUSION — the production serving
 * shape for RAG/search stacks, where neither signal alone ranks well
 * (BM25 misses paraphrase, embeddings miss rare exact terms; RRF
 * rewards documents BOTH retrievers surface without having to
 * calibrate their incomparable score scales).
 *
 * RRF (Cormack, Clarke & Buettcher, SIGIR'09):
 * `score(d) = Σ_lists 1 / (k0 + rank_d)` with the conventional
 * k0 = 60; absent-from-a-list contributes 0. Ranks are dense
 * positions under each list's own (score desc, id asc) order, so a
 * deterministic pair of retriever outputs fuses deterministically
 * (the fused score is rounded to 8 before the id-tie-broken final
 * rank — an independent engine reproduces it exactly).
 *
 * Scale shape: fusion touches only the CANDIDATE lists (nLex + nSem
 * rows per query — hundreds, not corpus-sized), so the serve cost is
 * the two pruned index reads it composes: the |terms|-bucket BM25
 * read and the probed-cluster IVF read. Nothing here ever scans the
 * corpus.
 */
object Hybrid {

  /** Fuse ranked candidate lists by RRF. Each list is an `(idCol,
    * scoreCol)` frame already bounded to its top-N (the retriever's
    * job); ranks are assigned per list by (score desc, id asc).
    * Returns (id, rrf) — fused score rounded to 8 — limited to
    * `topK` by (rrf desc, id asc). */
  def rrf(lists: Seq[(DataFrame, String, String)], k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k0 > 0 && topK > 0, s"k0 $k0 and topK $topK must be > 0")
    val contribs = lists.map { case (df, idCol, scoreCol) =>
      val a = df.select(col(idCol).as("id"), col(scoreCol).as("__s"))
      val b = a.select(col("id").as("__bid"), col("__s").as("__bs"))
      // rank = 1 + |rows strictly better| under (score desc, id asc).
      // A deliberate bounded N² self-join instead of a global window:
      // lists are top-N retriever outputs (hundreds of rows), so the
      // pairing is tiny, broadcast-nested-loop planned, and avoids
      // the unpartitioned WindowExec a single-partition rank would
      // plan (the scale-killer shape PlanAuditSpec bans — here it
      // would be bounded, but the plan can't prove that).
      a.join(b,
          col("__bs") > col("__s") ||
            (col("__bs") === col("__s") && col("__bid") < col("id")),
          "left_outer")
        .groupBy("id", "__s")
        .agg((count(col("__bid")) + 1).cast("int").as("__rank"))
        .select(col("id"),
          (lit(1.0) / (lit(k0) + col("__rank"))).as("__c"))
    }
    contribs.reduce(_.unionByName(_))
      .groupBy("id").agg(round(sum("__c"), 8).as("rrf"))
      // global top-k as sort+limit (TakeOrdered), never a window
      .orderBy(col("rrf").desc, col("id").asc).limit(topK)
  }

  /** One-call hybrid serve for a single query: BM25 top-`nLex` for
    * `terms` from the text index + cosine top-`nSem` for `queryVec`
    * from the vector index (probed IVF — both reads stay pruned),
    * RRF-fused to `topK`. `queryVec` is a one-row (id, vec) frame;
    * its id is excluded from the semantic candidates (the usual
    * self-match rule), so pass a non-corpus id for an external query.
    * An optional metadata `filter` applies to BOTH sides, below each
    * retriever's top-k: the semantic read takes it on the probed scan
    * (the [[VecIndex]] filtered-serve contract) and the lexical side
    * takes it through [[Search.searchBm25]]'s own filtered serve when
    * the TEXT index stores the referenced columns — both candidate
    * lists stay FULL among matching docs. When the text index lacks
    * the column(s), the lexical side falls back to filtering its
    * top-`nLex` pool against the VECTOR index's stored metadata
    * (ranks re-densify over the survivors — thins rather than deepens
    * the lexical signal; ingest the metadata at `writeIndex` to get
    * the full-k path). Either way a violating id NEVER surfaces. */
  def hybridTopK(spark: SparkSession, textIdx: Search.Index,
      vecIdx: VecIndex.Index, terms: Seq[String], queryVec: DataFrame,
      nProbe: Int = 2, nLex: Int = 20, nSem: Int = 20, k0: Int = 60,
      topK: Int = 10,
      filter: Option[Column] = None): DataFrame = {
    val lex = filter match {
      case None => Search.searchBm25(spark, textIdx, terms, topK = nLex)
      case Some(flt) =>
        try Search.searchBm25(spark, textIdx, terms, topK = nLex,
          filter = Some(flt))
        catch {
          // ONLY the typed filter-column-not-stored refusal switches
          // to the thinned fallback; other argument errors propagate
          case _: FilterUnresolved =>
            val ok = VecIndex.liveVecs(spark, vecIdx, Seq("id"),
              preFilter = Some(flt))
            Search.searchBm25(spark, textIdx, terms, topK = nLex)
              .join(ok.select("id"), Seq("id"), "left_semi")
        }
    }
    val sem = VecIndex.ivfTopK(spark, queryVec, vecIdx, nProbe, nSem,
      filter = filter)
    rrf(Seq((lex, "id", "score"), (sem, "nid", "cos")), k0, topK)
  }

  /** BATCHED RRF: fuse per-query ranked lists for a whole batch.
    * Each list is a `(df, qidCol, idCol, scoreCol)` frame holding
    * top-N candidates for MANY queries; ranks densify within
    * `(qid, list)` by (score desc, id asc) and fusion sums within
    * qid — per-query results identical to [[rrf]] on that query's
    * slices. Ranking is a qid-PARTITIONED window (each query's
    * candidate list is top-N-bounded, so partitions are tiny and the
    * shuffle is by qid — the scale-safe shape; the single-query
    * [[rrf]]'s bounded self-join exists precisely because it has no
    * partitioning key). Returns (qid, id, rrf) with at most `topK`
    * rows per qid. */
  def rrfBatch(lists: Seq[(DataFrame, String, String, String)],
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfBatch needs at least one ranked list")
    require(k0 > 0 && topK > 0, s"k0 $k0 and topK $topK must be > 0")
    import org.apache.spark.sql.expressions.Window
    val contribs = lists.map { case (df, qidCol, idCol, scoreCol) =>
      val a = df.select(col(qidCol).as("qid"), col(idCol).as("id"),
        col(scoreCol).as("__s"))
      val w = Window.partitionBy("qid")
        .orderBy(col("__s").desc, col("id").asc)
      a.withColumn("__rank", row_number().over(w))
        .select(col("qid"), col("id"),
          (lit(1.0) / (lit(k0) + col("__rank"))).as("__c"))
    }
    val wf = Window.partitionBy("qid")
      .orderBy(col("rrf").desc, col("id").asc)
    contribs.reduce(_.unionByName(_))
      .groupBy("qid", "id").agg(round(sum("__c"), 8).as("rrf"))
      .withColumn("__rk", row_number().over(wf))
      .filter(col("__rk") <= topK)
      .select("qid", "id", "rrf")
  }

  /** BATCHED hybrid serve: [[hybridTopK]] for a whole frame of
    * queries — `queries` is `(qid, terms: array<string>, vec)` — with
    * NO per-query job fan-out: the lexical side evaluates every term
    * set in one bucket-pruned postings pass
    * ([[Search.searchBm25Batch]]), the semantic side is the
    * already-batched probed read ([[VecIndex.ivfTopK]], one probe
    * pass per codebook-version group regardless of query count), and
    * fusion is [[rrfBatch]] (qid-partitioned windows over the bounded
    * candidate lists). Per-query results identical to [[hybridTopK]]
    * on that query alone. A query's own qid is excluded from its
    * semantic candidates (the usual self-match rule — pass non-corpus
    * qids for external queries). `filter` binds to both sides below
    * each retriever's top-k, with the same lexical fallback contract
    * as [[hybridTopK]] when the text index lacks the column(s). */
  def hybridTopKBatch(spark: SparkSession, textIdx: Search.Index,
      vecIdx: VecIndex.Index, queries: DataFrame,
      nProbe: Int = 2, nLex: Int = 20, nSem: Int = 20, k0: Int = 60,
      topK: Int = 10,
      filter: Option[Column] = None): DataFrame = {
    val qterms = queries.select("qid", "terms")
    val lex = filter match {
      case None =>
        Search.searchBm25Batch(spark, textIdx, qterms, topK = nLex)
      case Some(flt) =>
        try Search.searchBm25Batch(spark, textIdx, qterms, topK = nLex,
          filter = Some(flt))
        catch {
          case _: FilterUnresolved =>
            val ok = VecIndex.liveVecs(spark, vecIdx, Seq("id"),
              preFilter = Some(flt))
            Search.searchBm25Batch(spark, textIdx, qterms, topK = nLex)
              .join(ok.select("id"), Seq("id"), "left_semi")
        }
    }
    val sem = VecIndex.ivfTopK(spark,
      queries.select(col("qid").as("id"), col("vec")), vecIdx,
      nProbe, nSem, filter = filter)
    rrfBatch(Seq((lex, "qid", "id", "score"), (sem, "qid", "nid", "cos")),
      k0, topK)
  }
}
