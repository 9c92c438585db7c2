package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.GenLog

class VecIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range): DataFrame =
    ids.map { id =>
      id.toLong -> Array.tabulate(64) { i =>
        (((id * 31 + i * 13) % 17).toFloat - 8f) / 8f
      }
    }.toDF("id", "vec")

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def genDirs(path: String): Int = {
    val d = new java.io.File(s"$path/vecs")
    if (!d.exists()) 0
    else d.listFiles().count(f => f.isDirectory && f.getName.startsWith("gen="))
  }

  test("binary serve: init + two appended folds == fresh-built index " +
      "== inline binaryTopK; fold cost never re-encodes the corpus") {
    val all = corpus(0 until 60)
    val path = "target/tmp/vecidx-bin-folds"
    // folded: 3 generations
    val idx = VecIndex.init(corpus(0 until 20), 64, path)
    VecIndex.append(corpus(20 until 40), idx)
    VecIndex.append(corpus(40 until 60), idx)
    assert(VecIndex.countVecs(spark, idx) == 60)
    val qs = all.filter(col("id") < 4)
    val folded = rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4))
    // fresh single-generation build
    val freshIdx = VecIndex.init(all, 64, "target/tmp/vecidx-bin-fresh")
    assert(rows(VecIndex.binaryTopK(spark, qs, freshIdx, 12, 4)) == folded)
    // inline (no index at all)
    assert(rows(Similarity.binaryTopK(qs, all, 64, 12, 4)) == folded)
  }

  test("deleteWhere: predicate tombstones == delete-by-ids on the " +
      "same predicate; stats agree; the reingest cycle stays intact; " +
      "an un-stored column fails loudly") {
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val tagged = corpus(0 until 40).withColumn("lang",
      when(pmod(col("id"), lit(3)) === 0, "en").otherwise("xx"))
    def build(path: String): VecIndex.Index = {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(path))
      val idx = VecIndex.init(tagged.filter(col("id") < 20), 64, path,
        centroids = Some(cents), cbBuckets = 2)
      VecIndex.append(tagged.filter(col("id") >= 20), idx)
      idx
    }
    val a = build("target/tmp/vecidx-delwhere-a")
    val b = build("target/tmp/vecidx-delwhere-b")
    VecIndex.deleteWhere(spark, a, col("lang") === "xx")
    VecIndex.delete(tagged.filter(col("lang") === "xx").select("id"),
      "id", b)
    assert(VecIndex.countVecs(spark, a) == VecIndex.countVecs(spark, b))
    val qs = corpus(100 until 102)
    def serve(idx: VecIndex.Index) =
      rows(VecIndex.ivfTopK(spark, qs, idx, 2, 5))
    assert(serve(a) == serve(b) && serve(a).nonEmpty)
    assert(serve(a).forall(_._2 % 3 == 0), "every xx vector must be gone")
    // reingest: a corrected vector re-enters and can serve
    VecIndex.append(tagged.filter(col("id") === 7L)
      .withColumn("lang", lit("en")), a)
    assert(VecIndex.countVecs(spark, a) ==
      VecIndex.countVecs(spark, b) + 1)
    // matching nothing: harmless no-op on the live set
    val before = serve(a)
    VecIndex.deleteWhere(spark, a, col("lang") === "zz-nope")
    assert(serve(a) == before)
    // un-stored column: loud, typed
    intercept[FilterUnresolved] {
      VecIndex.deleteWhere(spark, a, col("tongue") === "xx")
    }
  }

  test("maxSimTopK: docs rank by max/mean over their retrieved " +
      "chunks' cosines — equals the manual aggregation of the probed " +
      "serve; a metadata filter binds below the candidate pool") {
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val chunks = corpus(0 until 40).withColumn("doc", expr("id div 4"))
    val path = "target/tmp/vecidx-maxsim"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val idx = VecIndex.init(chunks, 64, path,
      centroids = Some(cents), cbBuckets = 2)
    val qs = corpus(100 until 102)
    val cand = VecIndex.ivfTopK(spark, qs, idx, 2, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def manual(aggMax: Boolean) = cand
      .groupBy { case (q, nid, _) => (q, nid / 4) }
      .map { case ((q, doc), rs) =>
        val cs = rs.map(_._3)
        (q, doc, if (aggMax) cs.max
          else BigDecimal(cs.sum / cs.size)
            .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
      .groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3)
      }.toSet
    assert(rows(VecIndex.maxSimTopK(spark, qs, idx, "doc", 2, 8, 3))
      == manual(aggMax = true))
    assert(rows(VecIndex.maxSimTopK(spark, qs, idx, "doc", 2, 8, 3,
      agg = "mean")) == manual(aggMax = false))
    // filter binds below the pool: only matching docs' chunks compete
    val evens = VecIndex.maxSimTopK(spark, qs, idx, "doc", 2, 8, 3,
        filter = Some(pmod(col("doc"), lit(2)) === 0))
      .collect().map(_.getLong(1))
    assert(evens.nonEmpty && evens.forall(_ % 2 == 0))
  }

  test("maxSimTopKMulti: docs rank by the ColBERT sum-of-max over " +
      "per-token retrieved chunks — equals the manual aggregation; a " +
      "single-token query degenerates to maxSimTopK") {
    val cents = corpus(0 until 4)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val chunks = corpus(0 until 40).withColumn("doc", expr("id div 4"))
    val path = "target/tmp/vecidx-maxsim-multi"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val idx = VecIndex.init(chunks, 64, path,
      centroids = Some(cents), cbBuckets = 2)
    // 2 queries × 2 token embeddings each, non-corpus qtok ids
    val queries = Seq((900L, 100L), (900L, 101L), (901L, 102L),
        (901L, 103L)).toDF("qid", "qtok")
      .join(corpus(100 until 104).withColumnRenamed("id", "qtok"),
        "qtok")
    val cand = VecIndex.ivfTopK(spark,
        queries.select(col("qtok").as("id"), col("vec")), idx, 2, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val q2t = Map(100L -> 900L, 101L -> 900L, 102L -> 901L,
      103L -> 901L)
    val manual = cand
      .groupBy { case (t, nid, _) => (q2t(t), nid / 4, t) }
      .map { case ((q, doc, _), rs) => (q, doc, rs.map(_._3).max) }
      .groupBy { case (q, doc, _) => (q, doc) }
      .map { case ((q, doc), rs) =>
        (q, doc, BigDecimal(rs.map(_._3).sum)
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
      .groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3)
      }.toSet
    assert(rows(VecIndex.maxSimTopKMulti(spark, queries, idx, "doc",
      2, 8, 3)) == manual)
    // one token per query == maxSimTopK on those tokens as queries
    val single = queries.filter(col("qtok").isin(100L, 102L))
    val gotS = rows(VecIndex.maxSimTopKMulti(spark, single, idx,
      "doc", 2, 8, 3))
    val wantS = rows(VecIndex.maxSimTopK(spark,
        corpus(100 until 101).unionByName(corpus(102 until 103)),
        idx, "doc", 2, 8, 3))
      .map { case (t, doc, s) =>
        (q2t(t), doc,
          BigDecimal(s).setScale(5,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(gotS == wantS)
  }

  test("delete tombstones ids from every serve path; delete + append " +
      "is the re-embed cycle (gen-aware kill)") {
    val path = "target/tmp/vecidx-bin-del"
    val idx = VecIndex.init(corpus(0 until 40), 64, path)
    VecIndex.append(corpus(40 until 60), idx)
    VecIndex.delete(Seq(7L, 8L, 9L, 50L).toDF("id"), "id", idx)
    assert(VecIndex.countVecs(spark, idx) == 56)
    val live = corpus(0 until 60)
      .filter(!col("id").isin(7L, 8L, 9L, 50L))
    val qs = corpus(0 until 60).filter(col("id") < 3)
    val served = rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4))
    assert(served == rows(Similarity.binaryTopK(qs, live, 64, 12, 4)))
    assert(!served.exists(r => Set(7L, 8L, 9L, 50L)(r._2)),
      "tombstoned ids must not surface")
    // re-embed: append a REPLACEMENT vector for id 7 — live again,
    // with the new embedding (old gen's row stays dead)
    val newVec = Seq(7L -> Array.tabulate(64)(i =>
      if (i % 2 == 0) 1.0f else -1.0f)).toDF("id", "vec")
    VecIndex.append(newVec, idx)
    assert(VecIndex.countVecs(spark, idx) == 57)
    val live2 = live.unionByName(newVec)
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) ==
      rows(Similarity.binaryTopK(qs, live2, 64, 12, 4)))
    // deleting an unknown/dead id is a stats no-op
    VecIndex.delete(Seq(9L, 999L).toDF("id"), "id", idx)
    assert(VecIndex.countVecs(spark, idx) == 57)
  }

  test("IVF serve from the generational index: folds == fresh == " +
      "inline; probed buckets prune the generation scan") {
    val cents = corpus(0 until 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val all = corpus(0 until 60)
    val path = "target/tmp/vecidx-ivf"
    val idx = VecIndex.init(corpus(0 until 30), 64, path,
      centroids = Some(cents), cbBuckets = 4)
    VecIndex.append(corpus(30 until 60), idx)
    val qs = all.filter(col("id") < 4)
    val served = VecIndex.ivfTopK(spark, qs, idx, 2, 3)
    val got = rows(served)
    assert(got == rows(Similarity.ivfTopK(qs, all, cents, 2, 3)))
    val fresh = VecIndex.init(all, 64, "target/tmp/vecidx-ivf-fresh",
      centroids = Some(cents), cbBuckets = 4)
    assert(rows(VecIndex.ivfTopK(spark, qs, fresh, 2, 3)) == got)
    // the lists scan carries a partition filter on cb (planning-time
    // pruning to the probed bucket dirs)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("cb#") || plan.contains("PartitionFilters: [cb"),
      s"no cb partition pruning visible in plan:\n$plan")
  }

  test("compact + vacuum bound the directory count and preserve " +
      "results; structural commits refuse over in-flight appends") {
    val path = "target/tmp/vecidx-compact"
    val idx = VecIndex.init(corpus(0 until 20), 64, path)
    (1 to 4).foreach(i => VecIndex.append(corpus(i * 20 until i * 20 + 20), idx))
    VecIndex.delete(Seq(3L, 77L).toDF("id"), "id", idx)
    val qs = corpus(0 until 100).filter(col("id") < 3)
    val before = rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4))
    assert(genDirs(path) == 5)
    VecIndex.compact(spark, idx)
    val reclaimed = VecIndex.vacuum(spark, idx)
    assert(reclaimed.nonEmpty)
    assert(genDirs(path) == 1, "vacuum must fold generation dirs away")
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) == before)
    assert(VecIndex.countVecs(spark, idx) == 98)
    // a claimed-unpublished lower slot blocks compact (fail-loud)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g = GenLog.claimGen(spark, f, path)
    val err = intercept[RuntimeException] { VecIndex.compact(spark, idx) }
    assert(err.getMessage.contains("claimed but unpublished"))
    // the appender publishes; compact proceeds
    VecIndex.writeSegmentAt(corpus(200 until 210), idx, GenLog.KindSeg, g)
    VecIndex.compact(spark, idx)
    assert(VecIndex.countVecs(spark, idx) == 108)
  }

  test("maintain: the metas-only policy noops, folds, full-compacts " +
      "past the purge fraction, and vacuums; serve answers unchanged") {
    val path = "target/tmp/vecidx-maintain"
    val cfg = GenLog.MaintainConfig(deltaGens = 2, purgeFrac = 0.4)
    val idx = VecIndex.init(corpus(0 until 20), 64, path)
    val qs = corpus(0 until 100).filter(col("id") < 3)
    assert(VecIndex.maintain(spark, idx, cfg).map(_._1) == Seq("noop"))
    // two delta generations -> fold + vacuum
    VecIndex.append(corpus(20 until 30), idx)
    VecIndex.append(corpus(30 until 40), idx)
    val before = rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4))
    val a1 = VecIndex.maintain(spark, idx, cfg)
    assert(a1.map(_._1) == Seq("fold", "vacuum"), s"got $a1")
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) == before)
    assert(VecIndex.maintain(spark, idx, cfg).map(_._1) == Seq("noop"))
    // delete-heavy window (20 of 40 live = 50% >= 40%) -> full purge
    VecIndex.delete((20L until 40L).toDF("id"), "id", idx)
    val a2 = VecIndex.maintain(spark, idx, cfg)
    assert(a2.map(_._1) == Seq("compact", "vacuum"), s"got $a2")
    assert(VecIndex.countVecs(spark, idx) == 20)
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) ==
      rows(VecIndex.binaryTopK(spark, qs,
        VecIndex.init(corpus(0 until 20), 64,
          "target/tmp/vecidx-maintain-fresh"), 12, 4)))
    assert(VecIndex.maintain(spark, idx, cfg).map(_._1) == Seq("noop"))
  }

  test("compactIncremental: folds only the dirty cb clusters, carries " +
      "clean ones by reference; serve answers, tombstones, exactly-once " +
      "and vacuum hold; full compact purges") {
    val path = "target/tmp/vecidx-inc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ownParts(g: Int): Set[String] =
      Option(new java.io.File(s"$path/vecs/gen=$g").list())
        .map(_.filter(_.startsWith("cb=")).toSet).getOrElse(Set.empty)
    def baseGen(): Int = GenLog.liveMetas(spark, f, path)
      .filter(_.kind == GenLog.KindBase).map(_.gen).max
    // 8 centroids, cbBuckets = 8 -> cb == cid: cluster-granular dirs
    val cents = corpus(0 until 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val idx = VecIndex.init(corpus(0 until 40), 64, path,
      centroids = Some(cents), cbBuckets = 8)
    val g1 = baseGen()
    assert(ownParts(g1).size > 1, "fixture needs several populated clusters")
    // delta: vectors EXACTLY at centroid 2 -> assigned cid = 2, so the
    // fold's dirty set is that single cluster; plus one tombstone
    val c2 = Array.tabulate(64)(i => (((2 * 31 + i * 13) % 17).toFloat - 8f) / 8f)
    VecIndex.appendBatch((100 until 105).map(id => (id.toLong, c2))
      .toDF("id", "vec"), idx, batchId = 0L)
    VecIndex.delete(Seq(5L).toDF("id"), "id", idx)
    val qs = corpus(0 until 40).filter(col("id") < 3)
    val before = rows(VecIndex.ivfTopK(spark, qs, idx, 3, 4))
    VecIndex.compactIncremental(spark, idx)
    val g2 = baseGen()
    assert(g2 != g1)
    assert(ownParts(g2) == Set("cb=2"),
      s"fold rewrote ${ownParts(g2)} — not cluster-granular")
    val carry = GenLog.carryEntries(spark, f, path, "vecs", g2)
    assert(carry.nonEmpty && carry.map(_._2).forall(_.contains(s"gen=$g1")))
    assert(!carry.exists(_._1 == "cb=2"),
      "the dirty cluster must not be carried (base-merge)")
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 3, 4)) == before)
    assert(VecIndex.countVecs(spark, idx) == 44)
    // vacuum keeps carried cluster dirs; serve still identical
    VecIndex.vacuum(spark, idx)
    carry.map(_._2).foreach(p => assert(
      f.exists(new org.apache.hadoop.fs.Path(p)),
      s"vacuum reclaimed carried $p"))
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 3, 4)) == before)
    // exactly-once watermark survived the fold: batch 0 replays as noop
    VecIndex.appendBatch((100 until 105).map(id => (id.toLong, c2))
      .toDF("id", "vec"), idx, batchId = 0L)
    assert(VecIndex.countVecs(spark, idx) == 44,
      "replayed batch must be skipped after fold+vacuum")
    // reingest the tombstoned id across a chained fold
    VecIndex.append(Seq((5L, c2)).toDF("id", "vec"), idx)
    VecIndex.compactIncremental(spark, idx)
    VecIndex.vacuum(spark, idx)
    assert(VecIndex.countVecs(spark, idx) == 45)
    // the reingested vector serves from its new cluster (cid 2)
    val q5 = Seq((999L, c2)).toDF("id", "vec")
    assert(rows(VecIndex.ivfTopK(spark, q5, idx, 1, 20))
      .exists(_._2 == 5L), "reingested id must serve again")
    // one more fold that does NOT touch id 5's cluster: the
    // consolidated tombstone must keep its ORIGINAL kill gen, or the
    // re-embedded id's carried rows die exactly here
    val c6 = Array.tabulate(64)(i =>
      (((6 * 31 + i * 13) % 17).toFloat - 8f) / 8f)
    VecIndex.append(Seq((300L, c6)).toDF("id", "vec"), idx)
    VecIndex.compactIncremental(spark, idx)
    VecIndex.vacuum(spark, idx)
    assert(rows(VecIndex.ivfTopK(spark, q5, idx, 1, 20))
      .exists(_._2 == 5L),
      "re-embedded id vanished one fold later — tombstone snapshot " +
        "lost its original kill generation")
    assert(VecIndex.countVecs(spark, idx) == 46)
    // full compact + vacuum purge carried remnants and tombstones;
    // the serve is unchanged by the physical purge (reingested corpus)
    val preCompact = rows(VecIndex.ivfTopK(spark, qs, idx, 3, 4))
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    assert(genDirs(path) == 1, s"full compact left ${genDirs(path)} dirs")
    assert(Option(new java.io.File(s"$path/tombs").list())
      .forall(_.count(_.startsWith("gen=")) == 0))
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 3, 4)) == preCompact)
  }

  test("PQ codes ride the generations: folds + delete == fresh == " +
      "direct ADC; the serve scan never reads the floats") {
    val all = corpus(0 until 60)
    val books = Similarity.pqTrainCodebooks(all, m = 4, subDim = 16,
      k = 8, iters = 3)
    val queries = Seq(0L, 1L).map { qid =>
      qid -> all.filter(col("id") === qid).head()
        .getSeq[Float](1).map(_.toDouble).toSeq
    }
    def res(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    // folded lifecycle with a delete + re-embed
    val idx = VecIndex.init(corpus(0 until 25), 64,
      "target/tmp/vecidx-pq", pq = Some(books))
    VecIndex.append(corpus(25 until 60), idx)
    VecIndex.delete(Seq(9L).toDF("id"), "id", idx)
    VecIndex.append(corpus(9 until 10), idx)
    val served = VecIndex.pqTopK(spark, queries, idx, 5)
    // direct (index-free) ADC over the same live set
    val direct = Similarity.pqSearch(
      Similarity.pqEncode(all, books, 16), books, queries, 16, 5)
    assert(res(served) == res(direct))
    // fresh single-generation build
    val fresh = VecIndex.init(all, 64, "target/tmp/vecidx-pq-fresh",
      pq = Some(books))
    assert(res(VecIndex.pqTopK(spark, queries, fresh, 5)) == res(direct))
    // compact preserves the code columns and the answer
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    assert(res(VecIndex.pqTopK(spark, queries, idx, 5)) == res(direct))
    // the ADC scan is pruned to (id, codes) — no float column read
    val scans = VecIndex.pqTopK(spark, queries, idx, 5)
      .queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
    assert(scans.nonEmpty && scans.forall(s =>
        s.contains("code0") && !s.contains("vec:") && !s.contains("bwords")),
      s"PQ serve scan not pruned to codes:\n${scans.mkString("\n")}")
  }

  test("IVFADC flavor: residual codes ride the generations, folds + " +
      "delete == fresh, probed buckets prune, compact preserves") {
    val all = corpus(0 until 60)
    val coarse = (0 until 8).map { id =>
      Array.tabulate(64)(i => ((((id * 31 + i * 13) % 17) - 8).toDouble / 8))
    }
    // residual books: train on raw corpus slices (any fixed codebook
    // is "the" codebook — both serve paths must just agree on it)
    val books = Similarity.pqTrainCodebooks(all, m = 4, subDim = 16,
      k = 8, iters = 2)
    val queries = Seq(0L, 1L, 2L).map { qid =>
      qid -> Array.tabulate(64)(i =>
        ((((qid * 31 + i * 13) % 17) - 8).toDouble / 8))
    }
    def res(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq.sorted
    val idx = VecIndex.init(corpus(0 until 30), 64,
      "target/tmp/vecidx-ivfpq", cbBuckets = 4,
      ivfPq = Some((coarse, books)))
    VecIndex.append(corpus(30 until 60), idx)
    val folded = res(VecIndex.ivfPqTopK(spark, queries, idx, 2, 5))
    assert(folded.nonEmpty)
    val fresh = VecIndex.init(all, 64, "target/tmp/vecidx-ivfpq-fresh",
      cbBuckets = 4, ivfPq = Some((coarse, books)))
    assert(res(VecIndex.ivfPqTopK(spark, queries, fresh, 2, 5)) == folded)
    // the serve plan prunes to the probed cb dirs and reads only codes
    val plan = VecIndex.ivfPqTopK(spark, queries, idx, 2, 5)
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(scans.nonEmpty && scans.forall(s =>
        s.contains("code0") && !s.contains("vec:") && !s.contains("bwords")),
      s"IVFADC serve scan not pruned to codes:\n${scans.mkString("\n")}")
    // delete drops a neighbor; re-open from disk agrees
    val victim = folded.head._2
    VecIndex.delete(Seq(victim).toDF("id"), "id", idx)
    val afterDel = res(VecIndex.ivfPqTopK(spark, queries,
      VecIndex.open(spark, "target/tmp/vecidx-ivfpq"), 2, 5))
    assert(!afterDel.exists(_._2 == victim))
    // compact + vacuum fold the layout, results unchanged
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    assert(res(VecIndex.ivfPqTopK(spark, queries, idx, 2, 5)) == afterDel)
  }

  test("appendBatch is exactly-once: a replayed micro-batch folds " +
      "zero new generations; streaming ingest converges to the batch build") {
    val path = "target/tmp/vecidx-stream-spec"
    val all = corpus(0 until 60)
    val idx = VecIndex.init(all.limit(0), 64, path)
    VecIndex.appendBatch(corpus(0 until 30), idx, batchId = 0L)
    VecIndex.appendBatch(corpus(30 until 60), idx, batchId = 1L)
    assert(VecIndex.countVecs(spark, idx) == 60)
    // replay batch 1 (a restarted stream re-delivering after a crash
    // between data write and checkpoint commit) — must be a no-op
    VecIndex.appendBatch(corpus(30 until 60), idx, batchId = 1L)
    assert(VecIndex.countVecs(spark, idx) == 60,
      "replayed batch must not double-append")
    val qs = all.filter(col("id") < 3)
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) ==
      rows(Similarity.binaryTopK(qs, all, 64, 12, 4)))
    // end-to-end through a real streaming query (file source, one
    // file per trigger, foreachBatch folding)
    val inDir = "target/tmp/vecidx-stream-spec-in"
    all.repartition(3, col("id")).write.mode("overwrite").parquet(inDir)
    val sIdx = VecIndex.init(all.limit(0), 64,
      "target/tmp/vecidx-stream-spec2")
    val q = spark.readStream.schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        VecIndex.appendBatch(b, sIdx, id); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(VecIndex.countVecs(spark, sIdx) == 60)
    assert(rows(VecIndex.binaryTopK(spark, qs, sIdx, 12, 4)) ==
      rows(Similarity.binaryTopK(qs, all, 64, 12, 4)))
  }

  test("appendBatch ingest scoping: a fresh ingest's batch 0 folds " +
      "against an index whose OLD ingest already folded batch ids past " +
      "it; per-scope watermarks survive compact+vacuum") {
    val path = "target/tmp/vecidx-ingest-scope"
    val all = corpus(0 until 60)
    val idx = VecIndex.init(all.limit(0), 64, path)
    VecIndex.appendBatch(corpus(0 until 20), idx, 0L, "ckptA")
    VecIndex.appendBatch(corpus(20 until 40), idx, 1L, "ckptA")
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    // the data-loss shape this pins: new checkpoint => batch ids
    // restart at 0; a global watermark (1 from ckptA) would skip it
    VecIndex.appendBatch(corpus(40 until 60), idx, 0L, "ckptB")
    assert(VecIndex.countVecs(spark, idx) == 60,
      "new ingest's batch 0 was swallowed by the old ingest's watermark")
    // per-scope replays stay idempotent, including across maintenance
    VecIndex.appendBatch(corpus(0 until 20), idx, 0L, "ckptA")
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    VecIndex.appendBatch(corpus(40 until 60), idx, 0L, "ckptB")
    VecIndex.appendBatch(corpus(20 until 40), idx, 1L, "ckptA")
    assert(VecIndex.countVecs(spark, idx) == 60)
    val qs = all.filter(col("id") < 3)
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) ==
      rows(Similarity.binaryTopK(qs, all, 64, 12, 4)))
  }

  test("appendBatch survives maintenance: a batch re-delivered AFTER " +
      "compact+vacuum reclaimed its seg@<id> marker is still skipped " +
      "(the base carries the fold watermark)") {
    val path = "target/tmp/vecidx-stream-maint"
    val all = corpus(0 until 50)
    val idx = VecIndex.init(all.limit(0), 64, path)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    VecIndex.appendBatch(corpus(0 until 20), idx, batchId = 0L)
    VecIndex.appendBatch(corpus(20 until 40), idx, batchId = 1L)
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    // the per-batch markers are gone — only the base (with watermark)
    val ms = GenLog.metas(spark, f, path)
    assert(!ms.exists(_.kind.startsWith("seg@")),
      "vacuum must have reclaimed the folded per-batch markers")
    assert(ms.exists(m => m.kind == GenLog.KindBase && m.fold == 1L),
      s"base must carry the folded batch watermark; got $ms")
    // crash-shaped replay: batch 1 re-delivered post-maintenance
    VecIndex.appendBatch(corpus(20 until 40), idx, batchId = 1L)
    assert(VecIndex.countVecs(spark, idx) == 40,
      "post-maintenance replay must not double-append")
    // a genuinely NEW batch still folds
    VecIndex.appendBatch(corpus(40 until 50), idx, batchId = 2L)
    assert(VecIndex.countVecs(spark, idx) == 50)
    // a second maintenance round carries the watermark forward
    VecIndex.compact(spark, idx)
    VecIndex.vacuum(spark, idx)
    VecIndex.appendBatch(corpus(40 until 50), idx, batchId = 2L)
    assert(VecIndex.countVecs(spark, idx) == 50)
    // serve results still match the inline path over the full corpus
    val qs = all.filter(col("id") < 3)
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) ==
      rows(Similarity.binaryTopK(qs, all, 64, 12, 4)))
  }

  test("binaryTopKProbed: nProbe = codebook size degrades to exactly " +
      "binaryTopK; small nProbe restricts candidates to probed clusters") {
    val path = "target/tmp/vecidx-probed"
    val all = corpus(0 until 60)
    val centroids = all.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val idx = VecIndex.init(all.filter(col("id") < 40), 64, path,
      centroids = Some(centroids), cbBuckets = 4)
    VecIndex.append(all.filter(col("id") >= 40), idx)
    val qs = all.filter(col("id") < 3)
    // probing EVERY cluster = the full corpus is candidate set — the
    // composition must reproduce the brute binaryTopK bit-for-bit
    assert(rows(VecIndex.binaryTopKProbed(spark, qs, idx,
        nProbe = 8, cands = 12, k = 4)) ==
      rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)),
      "nProbe=C must equal the unprobed serve")
    // with 1 probe, every neighbor must come from the query's top
    // cluster (the IVF candidate-restriction contract)
    val cb = spark.read.parquet(s"$path/centroids")
    val assigned = all
      .withColumn("cid", element_at(Similarity.nearestCids(col("vec"),
        Similarity.collectCodebook(cb), 1), 1))
      .select(col("id").as("nid"), col("cid"))
    val topProbe = qs
      .withColumn("pcid", element_at(Similarity.nearestCids(col("vec"),
        Similarity.collectCodebook(cb), 1), 1))
      .select(col("id").as("qid"), col("pcid"))
    val res1 = VecIndex.binaryTopKProbed(spark, qs, idx,
      nProbe = 1, cands = 12, k = 4)
    val offCluster = res1.join(assigned, "nid").join(topProbe, "qid")
      .filter(col("cid") =!= col("pcid")).count()
    assert(offCluster == 0,
      "nProbe=1 results must all live in the query's probed cluster")
  }

  test("binaryTopKProbed: prefilter scan prunes to the probed cb " +
      "bucket dirs AND to the packed (id, bwords, cid) slice — floats " +
      "unread until rerank, unprobed buckets unread entirely") {
    val path = "target/tmp/vecidx-probed-prune"
    val all = corpus(0 until 60)
    val centroids = all.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val idx = VecIndex.init(all, 64, path,
      centroids = Some(centroids), cbBuckets = 4)
    val qs = all.filter(col("id") < 2)
    val plan = VecIndex.binaryTopKProbed(spark, qs, idx,
        nProbe = 1, cands = 8, k = 3)
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(scans.exists(s => s.contains("bwords") && !s.contains("vec:")),
      s"prefilter scan not pruned to packed words:\n${scans.mkString("\n")}")
    // the probed cb literals must land as partition filters on the scan
    assert(plan.contains("cb#") || plan.contains("cb IN") ||
      plan.contains("PartitionFilters: [isnotnull(cb"),
      s"no cb partition filter in plan:\n$plan")
    val pf = plan.split("\n").filter(_.contains("PartitionFilters"))
    assert(pf.nonEmpty && pf.forall(_.contains("cb")),
      s"probed-bucket pruning missing:\n${pf.mkString("\n")}")
  }

  test("codebook retrain roll: install is inert, the re-encoded base " +
      "is the atomic swap, post-roll == fresh init with the new " +
      "codebook, vacuum reclaims the old version's sidecars") {
    val path = "target/tmp/vecidx-retrain"
    val all = corpus(0 until 60)
    val centA = all.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val centB = all.filter(col("id") >= 8 && col("id") < 16)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val idx = VecIndex.init(corpus(0 until 40), 64, path,
      centroids = Some(centA), cbBuckets = 4)
    VecIndex.append(corpus(40 until 60), idx)
    val qs = all.filter(col("id") < 3)
    def serves() = (rows(VecIndex.ivfTopK(spark, qs, idx, 2, 4)),
      rows(VecIndex.binaryTopKProbed(spark, qs, idx, 2, 12, 4)),
      rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)))
    val pre = serves()
    assert(VecIndex.codebookVersion(spark, idx) == 0)
    // STAGE 1 — new codebook installed, nothing committed references
    // it: every serve (and the current version) is bit-identical
    val v = VecIndex.installCodebook(spark, idx, centroids = Some(centB))
    assert(v == 1 && VecIndex.codebookVersion(spark, idx) == 0)
    assert(serves() == pre, "installCodebook must be inert mid-roll")
    // STAGE 2 — the re-encoded base lands: post-roll probing uses
    // centB and must equal a FRESH init with centB over the live set
    VecIndex.reencode(spark, idx, v)
    assert(VecIndex.codebookVersion(spark, idx) == 1)
    assert(VecIndex.countVecs(spark, idx) == 60)
    val fresh = VecIndex.init(all, 64, "target/tmp/vecidx-retrain-fresh",
      centroids = Some(centB), cbBuckets = 4)
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 2, 4)) ==
      rows(VecIndex.ivfTopK(spark, qs, fresh, 2, 4)))
    assert(rows(VecIndex.binaryTopKProbed(spark, qs, idx, 2, 12, 4)) ==
      rows(VecIndex.binaryTopKProbed(spark, qs, fresh, 2, 12, 4)))
    // the binary serve never depended on the codebook — unchanged
    assert(rows(VecIndex.binaryTopK(spark, qs, idx, 12, 4)) == pre._3)
    // retention: once no live generation encodes under v0, vacuum
    // frees its sidecars; v1's stay
    VecIndex.vacuum(spark, idx)
    assert(!new java.io.File(s"$path/centroids").exists(),
      "v0 sidecar should be reclaimed after the roll")
    assert(new java.io.File(s"$path/centroids_v1").exists())
    // appends now encode under v1 and serve consistently
    VecIndex.append(corpus(60 until 70), idx)
    val fresh70 = VecIndex.init(corpus(0 until 70), 64,
      "target/tmp/vecidx-retrain-fresh70",
      centroids = Some(centB), cbBuckets = 4)
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 2, 4)) ==
      rows(VecIndex.ivfTopK(spark, qs, fresh70, 2, 4)))
  }

  test("mixed codebook versions (append raced the roll): each " +
      "generation is probed with its own codebook; compact refuses " +
      "until reencode unifies") {
    val path = "target/tmp/vecidx-retrain-race"
    val all = corpus(0 until 60)
    val centA = all.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val centB = all.filter(col("id") >= 8 && col("id") < 16)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val idx = VecIndex.init(corpus(0 until 40), 64, path,
      centroids = Some(centA), cbBuckets = 4)
    VecIndex.retrain(spark, idx, centroids = Some(centB))
    // the raced append: claimed while v0 was current, published after
    // the v1 base — its marker records cbv=0 (emulated via the
    // spec-only override; the claim/publish interleave is real)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g = GenLog.claimGen(spark, f, path)
    VecIndex.writeSegmentAt(corpus(40 until 60), idx, GenLog.KindSeg, g,
      cbvOverride = Some(0))
    assert(VecIndex.countVecs(spark, idx) == 60)
    // with every cluster probed, the candidate set in EACH group is
    // its whole slice — the mixed serve must equal the exact cosine
    // top-k over all live vectors (binaryTopK with cands = corpus)
    val qs = all.filter(col("id") < 3)
    val exact = rows(VecIndex.binaryTopK(spark, qs, idx, 60, 4))
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 8, 4)) == exact,
      "nProbe=C over mixed versions must equal the exact top-k")
    assert(rows(VecIndex.binaryTopKProbed(spark, qs, idx, 8, 60, 4)) ==
      exact)
    // structural guard: compact cannot silently merge rows encoded
    // under different codebooks
    val err = intercept[RuntimeException] {
      VecIndex.compact(spark, idx)
    }
    assert(err.getMessage.contains("codebook versions"))
    // reencode unifies onto the current version; compact then works
    VecIndex.reencode(spark, idx, VecIndex.codebookVersion(spark, idx))
    VecIndex.compact(spark, idx)
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 8, 4)) == exact)
  }

  test("retrain rolls the PQ codebooks too: post-roll ADC serve == " +
      "fresh init with the new books") {
    val path = "target/tmp/vecidx-retrain-pq"
    val all = corpus(0 until 60)
    def books(seed: Int): Seq[Array[Array[Double]]] =
      (0 until 4).map { s =>
        Array.tabulate(8, 16) { (c, j) =>
          (((seed + s * 7 + c * 13 + j * 3) % 17) - 8) / 8.0
        }
      }
    val idx = VecIndex.init(corpus(0 until 40), 64, path,
      pq = Some(books(1)))
    VecIndex.append(corpus(40 until 60), idx)
    val queries = Seq(0L -> Seq.tabulate(64)(i => (i % 5 - 2) / 2.0))
    val pre = VecIndex.pqTopK(spark, queries, idx, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    VecIndex.retrain(spark, idx, pq = Some(books(2)))
    val fresh = VecIndex.init(all, 64, "target/tmp/vecidx-retrain-pq-f",
      pq = Some(books(2)))
    val post = VecIndex.pqTopK(spark, queries, idx, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(post == VecIndex.pqTopK(spark, queries, fresh, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // different books => (very likely) different ADC shortlists; the
    // point is post-roll equivalence, pre is only captured to prove
    // the call ran against v0 before the roll
    assert(pre.nonEmpty && post.nonEmpty)
  }

  test("maintain's retrain trigger: a candidate codebook that fits " +
      "the drifted corpus better rolls the index at the threshold; an " +
      "identical candidate measures zero drift and is discarded") {
    // initial distribution + centroids drawn from it
    val a = corpus(0 until 30)
    val cents = a.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val path = "target/tmp/vecidx-retrain-policy"
    val idx = VecIndex.init(a, 64, path,
      centroids = Some(cents), cbBuckets = 4)
    // DRIFTED fold: a far-away distribution (near-constant positive
    // vectors, orthogonal-ish to the corpus generator's range)
    val drifted = (100 until 160).map { id =>
      id.toLong -> Array.tabulate(64)(i =>
        5f + ((id * 7 + i * 3) % 5).toFloat / 10f)
    }.toDF("id", "vec")
    VecIndex.append(drifted, idx)
    // candidate trained on the drifted region (8 of its vectors)
    val cand = drifted.filter(col("id") < 108)
      .select((col("id") - 100).as("cid"), col("vec").as("cvec"))
    val drift = VecIndex.assignmentDrift(spark, idx, cand)
    assert(drift >= 0.3 && drift <= 1.0, s"drift $drift")
    // below threshold: candidate discarded, codebook version unchanged
    val kept = VecIndex.maintain(spark, idx,
      candidateCentroids = Some(cand), retrainFrac = 0.99)
    assert(kept.exists(_._1 == "drift-ok"), s"$kept")
    assert(VecIndex.codebookVersion(spark, idx) == 0)
    // at threshold: the sweep runs the full retrain roll
    val acts = VecIndex.maintain(spark, idx,
      candidateCentroids = Some(cand), retrainFrac = 0.3)
    assert(acts.exists(_._1 == "retrain"), s"$acts")
    assert(VecIndex.codebookVersion(spark, idx) == 1)
    // post-roll serve == fresh init with the candidate codebook
    val qs = drifted.filter(col("id") < 103)
    val fresh = VecIndex.init(a.unionByName(drifted), 64,
      "target/tmp/vecidx-retrain-policy-fresh",
      centroids = Some(cand), cbBuckets = 4)
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 2, 3)) ==
      rows(VecIndex.ivfTopK(spark, qs, fresh, 2, 3)))
    // an identical candidate measures ZERO drift (tie goes to the
    // installed codebook) — no spurious roll, ever
    assert(VecIndex.assignmentDrift(spark, idx, cand) == 0.0)
    val again = VecIndex.maintain(spark, idx,
      candidateCentroids = Some(cand), retrainFrac = 0.01)
    assert(!again.exists(_._1 == "retrain"), s"$again")
    assert(VecIndex.codebookVersion(spark, idx) == 1)
  }

  // ---- filtered (hybrid) serve: metadata predicate + top-k ----

  private def withLang(df: DataFrame): DataFrame =
    df.withColumn("lang",
      when(pmod(col("id"), lit(3)) === 0, "en").otherwise("xx"))

  test("filtered IVF serve == unfiltered serve over an index built " +
      "from only the matching rows; k stays FULL where post-filtering " +
      "an unfiltered top-k under-fills") {
    val cents = corpus(0 until 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val all = withLang(corpus(0 until 60))
    val idx = VecIndex.init(all.filter(col("id") <= 30), 64,
      "target/tmp/vecidx-filtered", centroids = Some(cents), cbBuckets = 4)
    VecIndex.append(all.filter(col("id") > 30), idx)
    val qs = corpus(0 until 60).filter(col("id") < 6)
    val flt = Some(col("lang") === "en")
    val served = VecIndex.ivfTopK(spark, qs, idx, 2, 3, filter = flt)
    val got = rows(served)
    // ground truth: the same serve over an index holding ONLY the
    // matching rows (probe selection depends only on query+centroids;
    // candidate assignment only on the candidate's own vector)
    val fIdx = VecIndex.init(all.filter(col("lang") === "en"), 64,
      "target/tmp/vecidx-filtered-only", centroids = Some(cents),
      cbBuckets = 4)
    assert(got == rows(VecIndex.ivfTopK(spark, qs, fIdx, 2, 3)))
    assert(got.nonEmpty && got.forall(_._2 % 3 == 0),
      "every filtered neighbor must satisfy the predicate")
    // the contract the filtered serve exists for: post-filtering the
    // unfiltered top-k under-fills k for at least one query (2/3 of
    // rows are 'xx'), while the filtered serve keeps k full wherever
    // >= k matching candidates live in the probed clusters
    val post = rows(VecIndex.ivfTopK(spark, qs, idx, 2, 3))
      .filter(_._2 % 3 == 0)
    val fullPerQ = got.groupBy(_._1).map(_._2.size)
    assert(post.size < got.size,
      s"post-filter should under-fill: post=${post.size} got=${got.size}")
    assert(fullPerQ.exists(_ == 3), "some query should fill all of k=3")
    // equality + RANGE combined predicate: same ground-truth
    // equivalence (the filter is an arbitrary Column over stored cols)
    val flt2 = Some(col("lang") === "en" && col("id") < 40)
    val got2 = rows(VecIndex.ivfTopK(spark, qs, idx, 2, 3, filter = flt2))
    val fIdx2 = VecIndex.init(
      all.filter(col("lang") === "en" && col("id") < 40), 64,
      "target/tmp/vecidx-filtered-only2", centroids = Some(cents),
      cbBuckets = 4)
    assert(got2 == rows(VecIndex.ivfTopK(spark, qs, fIdx2, 2, 3)))
    // bucket pruning unchanged: probed cb literals still land as
    // partition filters; the metadata predicate pushes to the scan
    val plan = served.queryExecution.executedPlan.toString
    val pf = plan.split("\n").filter(_.contains("PartitionFilters"))
    assert(pf.nonEmpty && pf.forall(_.contains("cb")),
      s"probed-bucket pruning lost under filter:\n${pf.mkString("\n")}")
    assert(plan.contains("lang"),
      s"metadata predicate not visible on the scan:\n$plan")
  }

  test("filtered probed-binary serve: predicate applies BEFORE the " +
      "Hamming shortlist; metadata survives fold + compact + delete") {
    val cents = corpus(0 until 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val all = withLang(corpus(0 until 60))
    val idx = VecIndex.init(all.filter(col("id") <= 30), 64,
      "target/tmp/vecidx-filtered-bin", centroids = Some(cents),
      cbBuckets = 4)
    VecIndex.append(all.filter(col("id") > 30), idx)
    VecIndex.delete(Seq(0L, 3L).toDF("id"), "id", idx)
    VecIndex.compactIncremental(spark, idx)
    VecIndex.vacuum(spark, idx)
    val qs = corpus(0 until 60).filter(col("id") < 6)
    val flt = Some(col("lang") === "en")
    val got = rows(VecIndex.binaryTopKProbed(spark, qs, idx,
      nProbe = 8, cands = 10, k = 3, filter = flt))
    // nProbe = |codebook| probes everything => ground truth is the
    // flat filtered binary serve over the matching live rows
    val fIdx = VecIndex.init(
      all.filter(col("lang") === "en" && !col("id").isin(0L, 3L)), 64,
      "target/tmp/vecidx-filtered-bin-only")
    assert(got == rows(VecIndex.binaryTopK(spark, qs, fIdx, 10, 3)))
    assert(got.forall(r => r._2 % 3 == 0 && r._2 != 0L && r._2 != 3L))
  }

  test("metadata added MID-LIFE (append after a plain init) is " +
      "visible to filtered serves and survives reencode/compact — " +
      "pre-metadata generations read it as null") {
    val cents = corpus(0 until 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val idx = VecIndex.init(corpus(0 until 20), 64, // NO metadata
      "target/tmp/vecidx-midlife", centroids = Some(cents),
      cbBuckets = 4)
    VecIndex.append(withLang(corpus(20 until 40)), idx) // adds 'lang'
    val qs = corpus(0 until 40).filter(col("id") < 4)
    val got = rows(VecIndex.ivfTopK(spark, qs, idx, 8, 3,
      filter = Some(col("lang") === "en")))
    // pre-metadata rows have lang = null => filtered out; matching =
    // appended en rows only
    assert(got.nonEmpty && got.forall(r => r._2 >= 20 && r._2 % 3 == 0),
      s"mid-life filter must see only the tagged matching rows: $got")
    // a full compact must not DROP the mid-life column
    VecIndex.compact(spark, idx)
    assert(rows(VecIndex.ivfTopK(spark, qs, idx, 8, 3,
      filter = Some(col("lang") === "en"))) == got)
  }

  test("filtered serve fails loudly on a column the index does not " +
      "store; reserved metadata names are refused at ingest") {
    val idx = VecIndex.init(withLang(corpus(0 until 20)), 64,
      "target/tmp/vecidx-filtered-badcol")
    val qs = corpus(0 until 20).filter(col("id") < 2)
    val e = intercept[IllegalArgumentException] {
      VecIndex.binaryTopK(spark, qs, idx, 8, 3,
        filter = Some(col("tongue") === "en")).collect()
    }
    assert(e.getMessage.contains("stored columns") &&
      e.getMessage.contains("lang"),
      s"error should list the stored columns: ${e.getMessage}")
    val clash = intercept[IllegalArgumentException] {
      VecIndex.init(corpus(0 until 5).withColumn("cid", lit(1)), 64,
        "target/tmp/vecidx-filtered-clash")
    }
    assert(clash.getMessage.contains("collide"))
  }

  test("binary prefilter over the generational index column-prunes to " +
      "(id, bwords) — the float slice stays unread until rerank") {
    val path = "target/tmp/vecidx-prune"
    val idx = VecIndex.init(corpus(0 until 30), 64, path)
    val qs = corpus(0 until 30).filter(col("id") < 2)
    val plan = VecIndex.binaryTopK(spark, qs, idx, 8, 3)
      .queryExecution.executedPlan.toString
    // two scans of vecs/: the packed prefilter slice and the float
    // rerank slice — the prefilter one must not carry `vec`
    assert(plan.contains("bwords"), s"no packed scan in plan:\n$plan")
    val scans = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(scans.exists(s => s.contains("bwords") && !s.contains("vec:")),
      s"prefilter scan not pruned to packed words:\n${scans.mkString("\n")}")
  }
}
