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

  test("batched hybrid serve: per-query results identical to the " +
      "single-query pipe (unfiltered AND filtered-with-fallback); " +
      "plan shape independent of batch size — no per-query fan-out") {
    val docs = (0 until 40).map { id =>
      val toks = if (id % 2 == 0) "alpha beta gamma" else "alpha delta"
      (id.toLong, s"$toks doc$id")
    }.toDF("doc_id", "text")
    val sIdx = Search.writeIndex(docs, "doc_id", "text",
      "target/tmp/hybridb-text")
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val tagged = corpus(0 until 40).withColumn("lang",
      when(pmod(col("id"), lit(3)) === 0, "en").otherwise("xx"))
    val vIdx = VecIndex.init(tagged, 64, "target/tmp/hybridb-vec",
      centroids = Some(cents), cbBuckets = 2)
    val termSets = Seq(
      (100L, Seq("alpha", "beta")),
      (101L, Seq("alpha", "delta")),
      (102L, Seq("beta", "gamma")))
    val qvecs = corpus(100 until 103)
    val queries = termSets.toDF("qid", "terms")
      .join(qvecs.withColumnRenamed("id", "qid"), "qid")
    def byQid(df: DataFrame): Map[Long, Set[(Long, Double)]] =
      df.collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val batch = byQid(Hybrid.hybridTopKBatch(spark, sIdx, vIdx, queries,
      nProbe = 4, nLex = 10, nSem = 10, topK = 8))
    termSets.foreach { case (qid, terms) =>
      val single = Hybrid.hybridTopK(spark, sIdx, vIdx, terms,
          qvecs.filter(col("id") === qid), nProbe = 4, nLex = 10,
          nSem = 10, topK = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single, s"qid $qid diverges from " +
        s"the single-query pipe: ${batch(qid)} vs $single")
    }
    // filtered: the text index lacks `lang`, so the batch rides the
    // vector-metadata fallback — still per-query identical
    val fbatch = byQid(Hybrid.hybridTopKBatch(spark, sIdx, vIdx,
      queries, nProbe = 4, nLex = 10, nSem = 10, topK = 8,
      filter = Some(col("lang") === "en")))
    termSets.foreach { case (qid, terms) =>
      val single = Hybrid.hybridTopK(spark, sIdx, vIdx, terms,
          qvecs.filter(col("id") === qid), nProbe = 4, nLex = 10,
          nSem = 10, topK = 8, filter = Some(col("lang") === "en"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(fbatch.getOrElse(qid, Set.empty) == single)
      single.foreach { case (id, _) => assert(id % 3 == 0) }
    }
    // no per-query fan-out: the physical plan has the SAME leaf count
    // for a 1-query and a 3-query batch — the batch is one declarative
    // plan, not |queries| composed single-query plans
    def leaves(n: Int) = Hybrid.hybridTopKBatch(spark, sIdx, vIdx,
        queries.limit(n), nProbe = 4, nLex = 10, nSem = 10, topK = 8)
      .queryExecution.sparkPlan.collectLeaves().size
    assert(leaves(1) == leaves(3),
      "plan leaf count must not scale with the query count")
  }

  test("weighted fusion: all-1.0 weights reproduce the unweighted " +
      "output bit-for-bit (rrf AND rrfBatch); asymmetric weights " +
      "reweigh deterministically; bad weight vectors refuse loudly") {
    val lex = Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).toDF("id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.8), (1L, 0.7)).toDF("nid", "cos")
    val lists = Seq((lex, "id", "score"), (sem, "nid", "cos"))
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(Hybrid.rrf(lists, 60, 4, weights = Seq(1.0, 1.0))) ==
      rows(Hybrid.rrf(lists, 60, 4)))
    // weighted arithmetic: w_lex/(60+r_lex) + w_sem/(60+r_sem)
    val wgot = Hybrid.rrf(lists, 60, 4, weights = Seq(0.75, 0.25))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def f(terms: (Double, Int)*) = BigDecimal(
        terms.map { case (w, r) => w / (60 + r) }.sum)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(wgot == Map(
      1L -> f((0.75, 1), (0.25, 3)),
      2L -> f((0.75, 2), (0.25, 1)),
      3L -> f((0.75, 3)),
      4L -> f((0.25, 2))))
    // lexical-heavy weights rank the lexical-only id 3 above the
    // semantic-only id 4 (unweighted they tie the other way round)
    assert(wgot(3L) > wgot(4L))
    // batch face: per-qid slices identical to the single-query rrf
    val blex = lex.withColumn("qid", lit(7L))
      .unionByName(lex.withColumn("qid", lit(8L)))
    val bsem = sem.withColumn("qid", lit(7L))
      .unionByName(sem.withColumn("qid", lit(8L)))
    val batch = Hybrid.rrfBatch(
        Seq((blex, "qid", "id", "score"), (bsem, "qid", "nid", "cos")),
        60, 4, weights = Seq(0.75, 0.25))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.length == 8)
    Seq(7L, 8L).foreach { q =>
      assert(batch.filter(_._1 == q).map(t => (t._2, t._3)).toMap
        == wgot, s"qid $q diverges from the single-query weighted rrf")
    }
    intercept[IllegalArgumentException] {
      Hybrid.rrf(lists, 60, 4, weights = Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      Hybrid.rrf(lists, 60, 4, weights = Seq(1.0, 0.0))
    }
    intercept[IllegalArgumentException] {
      Hybrid.rrfBatch(Seq((blex, "qid", "id", "score")), 60, 4,
        weights = Seq(Double.NaN))
    }
  }

  test("min-max score fusion: per-list [0,1] normalization with " +
      "weighted sum; a constant-score list normalizes to 1.0; batch " +
      "face per-qid identical to the single face") {
    val lex = Seq((1L, 10.0), (2L, 6.0), (3L, 2.0)).toDF("id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.5), (1L, 0.1)).toDF("nid", "cos")
    val lists = Seq((lex, "id", "score"), (sem, "nid", "cos"))
    val got = Hybrid.minMaxFuse(lists, weights = Seq(0.75, 0.25),
        topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // lex norms: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0; sem: 2 -> 1.0,
    // 4 -> 0.5, 1 -> 0.0
    assert(got == Map(
      1L -> (0.75 * 1.0 + 0.25 * 0.0),
      2L -> (0.75 * 0.5 + 0.25 * 1.0),
      3L -> 0.0,
      4L -> 0.25 * 0.5))
    // constant-score list: every candidate equally best -> norm 1.0
    val const = Seq((5L, 3.0), (6L, 3.0)).toDF("id", "score")
    val cg = Hybrid.minMaxFuse(Seq((const, "id", "score")), topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(cg == Map(5L -> 1.0, 6L -> 1.0))
    // batch == single per qid
    val blex = lex.withColumn("qid", lit(7L))
      .unionByName(lex.withColumn("qid", lit(8L)))
    val bsem = sem.withColumn("qid", lit(7L))
      .unionByName(sem.withColumn("qid", lit(8L)))
    val batch = Hybrid.minMaxFuseBatch(
        Seq((blex, "qid", "id", "score"), (bsem, "qid", "nid", "cos")),
        weights = Seq(0.75, 0.25), topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    Seq(7L, 8L).foreach { q =>
      assert(batch.filter(_._1 == q).map(t => (t._2, t._3)).toMap
        == got, s"qid $q diverges from the single-query minMaxFuse")
    }
  }

  test("fusion knobs on the serve faces: hybridTopK/hybridTopKBatch " +
      "with weights/fusion equal the manual composition; defaults " +
      "are bit-identical to the historical output") {
    val docs = (0 until 40).map { id =>
      val toks = if (id % 2 == 0) "alpha beta gamma" else "alpha delta"
      (id.toLong, s"$toks doc$id")
    }.toDF("doc_id", "text")
    val sIdx = Search.writeIndex(docs, "doc_id", "text",
      "target/tmp/hybrid-fuse-text")
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val vIdx = VecIndex.init(corpus(0 until 40), 64,
      "target/tmp/hybrid-fuse-vec", centroids = Some(cents),
      cbBuckets = 2)
    val qv = corpus(100 until 101)
    val terms = Seq("alpha", "beta")
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val lex = Search.searchBm25(spark, sIdx, terms, topK = 10)
    val sem = VecIndex.ivfTopK(spark, qv, vIdx, 4, 10)
    val lists = Seq((lex, "id", "score"), (sem, "nid", "cos"))
    assert(rows(Hybrid.hybridTopK(spark, sIdx, vIdx, terms, qv,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8,
        weights = Seq(0.75, 0.25))) ==
      rows(Hybrid.rrf(lists, 60, 8, weights = Seq(0.75, 0.25))))
    assert(rows(Hybrid.hybridTopK(spark, sIdx, vIdx, terms, qv,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8,
        weights = Seq(0.6, 0.4), fusion = "minmax")) ==
      rows(Hybrid.minMaxFuse(lists, Seq(0.6, 0.4), 8)))
    intercept[IllegalArgumentException] {
      Hybrid.hybridTopK(spark, sIdx, vIdx, terms, qv,
        fusion = "zscore")
    }
    // batch face
    val queries = Seq((100L, terms)).toDF("qid", "terms")
      .join(qv.withColumnRenamed("id", "qid"), "qid")
    def brows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blex = Search.searchBm25Batch(spark, sIdx,
      queries.select("qid", "terms"), topK = 10)
    val bsem = VecIndex.ivfTopK(spark,
      queries.select(col("qid").as("id"), col("vec")), vIdx, 4, 10)
    val blists =
      Seq((blex, "qid", "id", "score"), (bsem, "qid", "nid", "cos"))
    assert(brows(Hybrid.hybridTopKBatch(spark, sIdx, vIdx, queries,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8,
        weights = Seq(0.75, 0.25), fusion = "minmax")) ==
      brows(Hybrid.minMaxFuseBatch(blists, Seq(0.75, 0.25), 8)))
  }

  test("deepen-then-filter fallback: when the text index lacks the " +
      "filter column and post-filtering the top-nLex would under-fill, " +
      "the fallback serves IDENTICALLY to a metadata-ingested index's " +
      "exact filtered serve (single AND batch faces)") {
    // BM25 rank == id order (one hit of `alpha`, dlen grows with id),
    // en docs every 4th id: top-10 holds only 3 matching docs (post-
    // filtering thins to 3), while the exact filtered top-10 has 10
    val docs = (0 until 40).map { id =>
      (id.toLong, ("alpha" +: Seq.fill(id + 1)("pad")).mkString(" "),
        if (id % 4 == 0) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
    val bare = Search.writeIndex(docs.drop("lang"), "doc_id", "text",
      "target/tmp/hybrid-deepen-bare")
    val withMeta = Search.writeIndex(docs, "doc_id", "text",
      "target/tmp/hybrid-deepen-meta")
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val tagged = corpus(0 until 40).withColumn("lang",
      when(pmod(col("id"), lit(4)) === 0, "en").otherwise("xx"))
    val vIdx = VecIndex.init(tagged, 64, "target/tmp/hybrid-deepen-vec",
      centroids = Some(cents), cbBuckets = 2)
    val qv = corpus(100 until 101)
    val flt = Some(col("lang") === "en")
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // sanity: the scenario genuinely under-fills a post-filtered pool
    val pool = Search.searchBm25(spark, bare, Seq("alpha"), topK = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(pool.count(_ % 4 == 0) < 10,
      s"fixture must under-fill on post-filter, top-10 = $pool")
    val viaFallback = Hybrid.hybridTopK(spark, bare, vIdx,
      Seq("alpha"), qv, nProbe = 4, nLex = 10, nSem = 10, topK = 8,
      filter = flt)
    val viaMeta = Hybrid.hybridTopK(spark, withMeta, vIdx,
      Seq("alpha"), qv, nProbe = 4, nLex = 10, nSem = 10, topK = 8,
      filter = flt)
    assert(rows(viaFallback) == rows(viaMeta) && rows(viaMeta).size == 8,
      s"${rows(viaFallback)} vs ${rows(viaMeta)}")
    // batch face: same equivalence, per qid
    val queries = Seq((100L, Seq("alpha"))).toDF("qid", "terms")
      .join(qv.withColumnRenamed("id", "qid"), "qid")
    def brows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brows(Hybrid.hybridTopKBatch(spark, bare, vIdx, queries,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8, filter = flt)) ==
      brows(Hybrid.hybridTopKBatch(spark, withMeta, vIdx, queries,
        nProbe = 4, nLex = 10, nSem = 10, topK = 8, filter = flt)))
  }
}
