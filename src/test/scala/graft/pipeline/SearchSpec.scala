package graft.pipeline

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "alpha beta"),
    (3L, "beta gamma delta"),
    (4L, "alpha beta gamma gamma gamma"),
    (5L, "epsilon zeta")).toDF("doc_id", "text")

  private lazy val idx = {
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("target/tmp/search-spec"))
    Search.writeIndex(docs, "doc_id", "text", "target/tmp/search-spec")
  }

  test("searchAll: conjunction semantics and tf scoring") {
    val got = Search.searchAll(spark, idx, Seq("alpha", "beta", "gamma"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 4 contain all three; score = summed tf
    assert(got == Map(1L -> 4L, 4L -> 5L))
    // single-term search degrades to a postings lookup
    val one = Search.searchAll(spark, idx, Seq("epsilon"))
      .collect().map(r => r.getLong(0)).toSet
    assert(one == Set(5L))
  }

  test("searchBm25: rare terms outrank common ones, tf saturates") {
    // "delta" appears in 1 of 5 docs, "beta" in 4 — a delta match must
    // outscore a beta match at equal tf; doc 4's triple gamma beats
    // doc 1's single gamma (monotone in tf).
    val byDelta = Search.searchBm25(spark, idx, Seq("delta"), 10)
      .collect().map(r => r.getLong(0)).toSeq
    assert(byDelta == Seq(3L))
    val scores = Search.searchBm25(spark, idx, Seq("gamma"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 3L, 4L))
    assert(scores(4L) > scores(1L))
    val mixed = Search.searchBm25(spark, idx, Seq("delta", "beta"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 (delta+beta) must beat any beta-only doc
    assert(mixed(3L) == mixed.values.max)
    // topK truncates deterministically
    assert(Search.searchBm25(spark, idx, Seq("beta"), 2).count() == 2)
  }

  test("searchAll: scan is partition-pruned to the term buckets") {
    val q = Search.searchAll(spark, idx, Seq("alpha"))
    q.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case o => o.children.flatMap(flatten)
    })
    val scans = flatten(q.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // the bucket predicate must land in partitionFilters (planning-time
    // pruning), not just dataFilters
    assert(scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "tb"))),
      scans.map(_.partitionFilters.mkString(",")).mkString("\n"))
  }
}
