package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.GenLog

/**
 * The GENERATIONAL VECTOR INDEX — [[Similarity]]'s at-rest ANN
 * artifacts with the [[graft.io.GenLog]] lifecycle the text index
 * ([[Search]]) got in r8. One format serves both retrieval paths:
 * each generation's `vecs/gen=N` parquet carries
 * `(id, vec, nrm, bwords[, cid])` — the float vectors, their norms,
 * the packed sign bits for the binary-Hamming prefilter, and (when a
 * coarse codebook was installed at [[init]]) the IVF cluster
 * assignment — so the binary serve path column-prunes to
 * `(id, bwords)` and the IVF path to its probed clusters, over the
 * SAME files.
 *
 * Lifecycle, verbatim from the generation-log contract:
 *  - [[append]] folds a NEW shard in as its own generation — cost
 *    O(shard) (encode + write), never a corpus re-encode. Corpus
 *    growth is an append, not a rewrite: the r9 `binaryIndexWrite` /
 *    `ivfWriteIndex` write-once artifacts stay for static corpora,
 *    this is the growing-corpus path.
 *  - [[delete]] commits an id tombstone generation; every serve path
 *    anti-joins it (gen-aware, so delete + append is the re-embed /
 *    reingest cycle — exactly how an embedding refresh rolls through
 *    a corpus). Skipped at planning time when no tombstones exist.
 *  - [[compact]] rewrites the live rows as one new BASE generation;
 *    [[vacuum]] reclaims below it plus stale claims/orphans —
 *    directory count stays bounded across folds.
 *  - Markers carry `(nVecs delta, dim, cb-bucket count)`, so
 *    [[countVecs]] is an exact integer sum over the read set and
 *    [[open]] needs no data scan. Concurrent appends take distinct
 *    slots through the LogStore CAS; structural commits refuse while
 *    a lower slot is claimed-unpublished (same races, same guard as
 *    Search).
 *
 * IVF at rest: generations are directory-partitioned by
 * `cb = pmod(cid, nBuckets)`, so a query batch's probed clusters
 * prune to |probed buckets| directories at PLANNING time (the
 * Search term-bucket trick). The probed-cid collect that builds the
 * literal bucket list is bounded by the codebook contract
 * (<= C <= ~1024 distinct cids), the same bound [[Similarity.collectCodebook]]
 * already rides. The codebook itself is FIXED at init (`centroids/`
 * sidecar): appends assign against it, so probing stays consistent
 * across folds — retrain = fresh init (the IVF re-cluster is a new
 * index by definition).
 */
object VecIndex {

  /** Handle: `cb` = IVF bucket-dir count (0 = binary-only index). */
  final case class Index(path: String, dim: Int, cbBuckets: Int) {
    def hasIvf: Boolean = cbBuckets > 0
  }

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val DataDirs = Seq("vecs", "tombs")

  /** Load the optional PQ codebook sidecar: (m codebooks of k×subDim),
    * None when PQ wasn't installed at [[init]]. Driver-side — m·k rows
    * by the PQ contract (e.g. 4×256), same bound as
    * [[Similarity.collectCodebook]]. */
  private def pqBooks(spark: SparkSession,
      idx: Index): Option[(Seq[Array[Array[Double]]], Int)] = {
    val f = fsOf(spark, idx.path)
    if (!f.exists(new Path(s"${idx.path}/pq"))) None
    else {
      val rows = spark.read.parquet(s"${idx.path}/pq")
        .select("s", "cid", "comp").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val m = rows.map(_._1).max + 1
      val books: Seq[Array[Array[Double]]] = (0 until m).map { s =>
        rows.filter(_._1 == s).sortBy(_._2).map(_._3)
      }
      Some((books, books.head.head.length))
    }
  }

  /** Load the optional IVFADC coarse codebook sidecar: euclidean
    * coarse centroids indexed by ccid (None when the index is not
    * residual-PQ flavored). Driver-side, C·dim doubles by contract. */
  private def coarseBook(spark: SparkSession,
      idx: Index): Option[Seq[Array[Double]]] = {
    val f = fsOf(spark, idx.path)
    if (!f.exists(new Path(s"${idx.path}/coarse"))) None
    else Some(spark.read.parquet(s"${idx.path}/coarse")
      .select("ccid", "comp").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2).toSeq)
  }

  // ---- encode + commit ----

  /** One generation's rows: floats + norm + packed sign bits, plus
    * per-flavor derived columns — cosine `cid` against the installed
    * IVF codebook, raw-PQ `code*` against the installed subspace
    * codebooks, or (IVFADC flavor) euclidean `ccid` + RESIDUAL codes
    * against the coarse + residual codebooks. */
  private def encoded(df: DataFrame, idx: Index): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col("id"), col("vec"),
      Similarity.norm(col("vec")).as("nrm"),
      Similarity.binaryQuantize(col("vec"), idx.dim).as("bwords"))
    coarseBook(spark, idx) match {
      case Some(coarse) =>
        // IVFADC: euclidean coarse assign, then PQ on the residual
        val (books, subDim) = pqBooks(spark, idx).getOrElse(
          sys.error(s"index at ${idx.path} has a coarse codebook " +
            "but no PQ codebooks"))
        val cn2 = coarse.map(v => v.map(x => x * x).sum).toArray
        val assigned = base.withColumn("ccid", element_at(
          graft.functions.VectorFunctions.nearestCentroids(
            col("vec"), coarse.toArray, cn2,
            coarse.indices.map(_.toLong).toArray, 1, euclidean = true), 1))
        val flat = org.apache.spark.sql.functions
          .typedlit(coarse.flatten.toSeq)
        val resVec = array((0 until idx.dim).map(i =>
          col("vec").getItem(i).cast("double") -
            element_at(flat, col("ccid").cast("int") * idx.dim + i + 1)): _*)
        val res = assigned.select(col("id"), resVec.as("__res"),
          col("vec"), col("nrm"), col("bwords"), col("ccid"))
        Similarity.pqEncode(
          res.withColumnRenamed("vec", "__ovec")
            .withColumnRenamed("__res", "vec"),
          books, subDim, extra = Seq("__ovec", "nrm", "bwords", "ccid"))
          .withColumnRenamed("__ovec", "vec")
      case None =>
        val withIvf =
          if (!idx.hasIvf) base
          else {
            val cb = Similarity.collectCodebook(
              spark.read.parquet(s"${idx.path}/centroids"))
            base.withColumn("cid",
              element_at(Similarity.nearestCids(col("vec"), cb, 1), 1))
          }
        pqBooks(spark, idx) match {
          case None => withIvf
          case Some((books, subDim)) =>
            val extra = Seq("vec", "nrm", "bwords") ++
              (if (idx.hasIvf) Seq("cid") else Nil)
            Similarity.pqEncode(withIvf, books, subDim, extra)
        }
    }
  }

  private def commitSegment(df: DataFrame, idx: Index,
      kind: String): Int = {
    val spark = df.sparkSession
    val f = fsOf(spark, idx.path)
    val g = GenLog.claimGen(spark, f, idx.path)
    writeSegmentAt(df, idx, kind, g)
  }

  /** The cluster column a generation's directory layout buckets by:
    * cosine-IVF `cid` or IVFADC `ccid` (None = flat layout). */
  private def clusterKey(columns: Seq[String], idx: Index): Option[String] =
    if (idx.cbBuckets <= 0) None
    else if (columns.contains("cid")) Some("cid")
    else if (columns.contains("ccid")) Some("ccid")
    else None

  /** Write one generation's rows with the index's layout (cluster-
    * bucketed dirs when a cluster column is present, flat otherwise). */
  private def writeGen(enc: DataFrame, idx: Index, g: Int): Unit =
    clusterKey(enc.columns.toSeq, idx) match {
      case Some(key) =>
        enc.withColumn("cb", pmod(col(key), lit(idx.cbBuckets)).cast("int"))
          .repartition(col("cb")).sortWithinPartitions(key)
          .write.mode("overwrite").partitionBy("cb")
          .parquet(s"${idx.path}/vecs/gen=$g")
      case None =>
        enc.write.mode("overwrite").parquet(s"${idx.path}/vecs/gen=$g")
    }

  /** Data write + publish for an already-claimed slot (split out for
    * the concurrent-lifecycle spec, like [[Search.writeSegmentAt]]). */
  private[pipeline] def writeSegmentAt(df: DataFrame, idx: Index,
      kind: String, g: Int): Int = {
    val spark = df.sparkSession
    val f = fsOf(spark, idx.path)
    writeGen(encoded(df, idx), idx, g)
    val n = df.count()
    GenLog.publish(spark, f, idx.path, g, kind, n, idx.dim, idx.cbBuckets)
    g
  }

  // ---- lifecycle ----

  /** Build a FRESH index at `path` (drops existing state): generation
    * 1 is a base. Install `centroids` (cid, cvec) to enable the IVF
    * serve path (`cbBuckets` partitions each generation's lists for
    * planning-time probe pruning), and/or `pq` subspace codebooks to
    * ride ADC codes next to every vector (the compressed serve path —
    * [[pqTopK]] never reads the floats). Both codebooks are FIXED at
    * init; appends encode against them, retrain = fresh init. */
  def init(corpus: DataFrame, dim: Int, path: String,
      centroids: Option[DataFrame] = None, cbBuckets: Int = 16,
      pq: Option[Seq[Array[Array[Double]]]] = None,
      ivfPq: Option[(Seq[Array[Double]], Seq[Array[Array[Double]]])] =
        None): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(ivfPq.isEmpty || (centroids.isEmpty && pq.isEmpty),
      "ivfPq is its own flavor — do not combine with centroids/pq")
    val f = fsOf(spark, path)
    f.delete(new Path(path), true)
    centroids.foreach(_.write.mode("overwrite")
      .parquet(s"$path/centroids"))
    def writePq(books: Seq[Array[Array[Double]]]): Unit = {
      require(books.nonEmpty && books.forall(_.nonEmpty),
        "empty PQ codebooks")
      require(dim % books.length == 0 &&
        books.forall(_.forall(_.length == dim / books.length)),
        s"PQ codebooks must tile dim $dim evenly")
      books.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (cent, cid) => (s, cid, cent.toSeq) }
      }.toDF("s", "cid", "comp")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/pq")
    }
    pq.foreach(writePq)
    ivfPq.foreach { case (coarse, books) =>
      require(coarse.nonEmpty && coarse.forall(_.length == dim),
        s"coarse centroids must be dim $dim")
      writePq(books)
      coarse.zipWithIndex.map { case (c, ccid) => (ccid, c.toSeq) }
        .toDF("ccid", "comp")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/coarse")
    }
    val idx = Index(path, dim,
      if (centroids.isDefined || ivfPq.isDefined) cbBuckets else 0)
    commitSegment(corpus, idx, GenLog.KindBase)
    idx
  }

  /** Open an existing committed index (dim + layout from the log). */
  def open(spark: SparkSession, path: String): Index = {
    val m = GenLog.liveMetas(spark, fsOf(spark, path), path).last
    Index(path, m.b.toInt, m.n)
  }

  /** Fold a NEW shard of vectors in as its own generation — O(shard).
    * Caller contract (as [[Search.append]]): shard ids must be new or
    * previously [[delete]]d; reingesting a live id would double it. */
  def append(df: DataFrame, idx: Index): Index = {
    commitSegment(df, idx, GenLog.KindSeg)
    idx
  }

  /** EXACTLY-ONCE streaming fold (use from `foreachBatch`): one
    * generation per micro-batch, idempotent on replay — the batch id
    * rides in the marker kind (`seg@<id>`), so a restarted query
    * re-delivering a batch finds its generation already committed and
    * skips instead of double-appending. The same batch-marker trick
    * [[graft.io.Versioned.appendBatch]] and the MatView refresh loop
    * use; with it, `readStream … .foreachBatch(appendBatch(_, idx, _))`
    * is an embedding-ingest pipeline whose index is always one marker
    * away from consistent. */
  def appendBatch(df: DataFrame, idx: Index, batchId: Long): Index = {
    val spark = df.sparkSession
    val f = fsOf(spark, idx.path)
    // batchApplied also honors the base markers' fold watermark, so a
    // batch re-delivered AFTER compact+vacuum reclaimed its seg@<id>
    // marker is still recognized and skipped (no double-append)
    if (GenLog.batchApplied(GenLog.metas(spark, f, idx.path), batchId)) idx
    else { commitSegment(df, idx, s"${GenLog.KindSeg}@$batchId"); idx }
  }

  /** Tombstone the given ids (one-column frame). Gen-aware kill:
    * a tombstone in generation G hides rows from generations before G
    * only, so delete + [[append]] re-embeds a document. */
  def delete(ids: DataFrame, idCol: String, idx: Index): Index = {
    val spark = ids.sparkSession
    val f = fsOf(spark, idx.path)
    val g = GenLog.claimGen(spark, f, idx.path)
    GenLog.requireNoInflightBelow(spark, f, idx.path, g, "delete")
    // count only LIVE victims so the marker delta keeps countVecs exact
    val victims = liveVecs(spark, idx, Seq("id"))
      .join(ids.select(col(idCol).as("id")).distinct(), "id")
      .localCheckpoint() // pin: stats and tombstones must agree exactly
    victims.select("id").write.mode("overwrite")
      .parquet(s"${idx.path}/tombs/gen=$g")
    val n = victims.count()
    GenLog.publish(spark, f, idx.path, g, GenLog.KindDel, -n, idx.dim,
      idx.cbBuckets)
    idx
  }

  /** Rewrite the live rows (tombstones applied) as ONE new base
    * generation, bounding read fan-in; [[vacuum]] then reclaims the
    * folded generations. */
  def compact(spark: SparkSession, idx: Index): Index = {
    val f = fsOf(spark, idx.path)
    val g = GenLog.claimGen(spark, f, idx.path)
    GenLog.requireNoInflightBelow(spark, f, idx.path, g, "compact")
    // carry every data column of the current layout (cluster ids, PQ
    // codes — whatever the flavor wrote), dropping only the cb
    // partition column writeGen re-derives
    val ms = GenLog.liveMetas(spark, f, idx.path)
    val cols = spark.read.option("basePath", s"${idx.path}/vecs")
      .parquet(ms.filter(_.kind != GenLog.KindDel)
        .map(m => s"${idx.path}/vecs/gen=${m.gen}"): _*)
      .schema.fieldNames.toSeq.filterNot(c => c == "cb" || c == "gen")
    val live = liveVecs(spark, idx, cols)
    writeGen(live, idx, g)
    val n = liveVecs(spark, idx, Seq("id")).count()
    // the base records the max folded streaming batch id, so the
    // exactly-once appendBatch guard survives vacuum reclaiming the
    // folded per-batch seg@<id> markers
    GenLog.publish(spark, f, idx.path, g, GenLog.KindBase, n, idx.dim,
      idx.cbBuckets, fold = GenLog.foldedBatchMax(ms))
    idx
  }

  /** Reclaim generations below the newest base + stale claims/orphans
    * (single maintainer — the [[GenLog.vacuum]] contract). */
  def vacuum(spark: SparkSession, idx: Index): Seq[Int] =
    GenLog.vacuum(spark, fsOf(spark, idx.path), idx.path, DataDirs)

  /** Exact live vector count — integer sum of marker deltas, no scan. */
  def countVecs(spark: SparkSession, idx: Index): Long =
    GenLog.liveMetas(spark, fsOf(spark, idx.path), idx.path).map(_.a).sum

  // ---- read side ----

  /** The committed, tombstone-resolved rows, pruned to `cols` (plus
    * the partition columns the read carries). Extra pushable `filter`
    * applies BELOW the anti-join, on the generation scan itself. */
  private def liveVecs(spark: SparkSession, idx: Index,
      cols: Seq[String],
      preFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val f = fsOf(spark, idx.path)
    val ms = GenLog.liveMetas(spark, f, idx.path)
    val segs = ms.filter(_.kind != GenLog.KindDel)
    val raw = spark.read.option("basePath", s"${idx.path}/vecs")
      .parquet(segs.map(m => s"${idx.path}/vecs/gen=${m.gen}"): _*)
    val filtered = preFilter.map(raw.filter).getOrElse(raw)
    val dels = ms.filter(_.kind == GenLog.KindDel)
    val resolved =
      if (dels.isEmpty) filtered
      else {
        val t = spark.read.option("basePath", s"${idx.path}/tombs")
          .parquet(dels.map(m => s"${idx.path}/tombs/gen=${m.gen}"): _*)
          .select(col("id").as("__tid"), col("gen").as("__tgen"))
        filtered.join(t,
          filtered("id") === t("__tid") && filtered("gen") < t("__tgen"),
          "left_anti")
      }
    resolved.select(cols.map(col): _*)
  }

  /**
   * [[Similarity.binaryTopK]] served from the generational index:
   * Hamming prefilter over the column-pruned (id, bwords) slice of
   * the LIVE generations, exact-cosine rerank through the default
   * distributed semi-join (the r10 serve shape — nothing through the
   * driver). Results identical to the inline path over the live
   * vector set (spec-pinned, and certified through `q_ann_binary`'s
   * oracle when the registered query builds via init + append folds).
   */
  def binaryTopK(spark: SparkSession, queries: DataFrame, idx: Index,
      cands: Int, k: Int): DataFrame = {
    require(cands >= k, s"cands $cands must be >= k $k")
    val nWords = idx.dim / 32
    val q = queries.select(col("id").as("qid"), col("vec").as("qvec"),
      Similarity.binaryQuantize(col("vec"), idx.dim).as("qb"),
      Similarity.norm(col("vec")).as("qn"))
    val packed = liveVecs(spark, idx, Seq("id", "bwords"))
    val pre = packed.select(col("id").as("nid"), col("bwords"))
      .join(broadcast(q.select(col("qid"), col("qb"))),
        col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Similarity.hammingDist(col("qb"), col("bwords"), nWords).as("ham"))
    val wPre = Window.partitionBy("qid").orderBy(asc("ham"), asc("nid"))
    val shortlist = pre.withColumn("rk", row_number().over(wPre))
      .filter(col("rk") <= cands).select("qid", "nid")
    val vecs = liveVecs(spark, idx, Seq("id", "vec", "nrm"))
      .select(col("id").as("nid"), col("vec").as("nvec"),
        col("nrm").as("cn"))
    val rer = shortlist
      .join(broadcast(q.select(col("qid"), col("qvec"), col("qn"))), "qid")
      .join(vecs, "nid")
      .select(col("qid"), col("nid"),
        round(Similarity.dot(col("qvec"), col("nvec"))
          / (col("qn") * col("cn")), 5).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    rer.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "nid", "cos")
  }

  /**
   * IVF×binary composed serve — the standard IVF+rescoring production
   * shape: probe `nProbe` clusters per query against the installed
   * codebook (as [[ivfTopK]]), prune the generation scan to the probed
   * `cb` bucket directories at PLANNING time, run the cheap
   * xor+popcount Hamming prefilter over ONLY the probed lists'
   * `(id, bwords)` slice, then the exact-cosine rerank over the
   * shortlist (float read pruned to the same probed buckets). This
   * replaces the one O(corpus × queries) serve shape [[binaryTopK]]
   * carries — per-batch prefilter cost is O(probed lists × queries),
   * sub-linear in corpus size once clusters outnumber probes, while
   * scoring stays the packed binary arithmetic. Recall contract:
   * candidates come from the probed clusters only (the IVF trade) —
   * `nProbe` = codebook size degrades to exactly [[binaryTopK]]
   * (spec-pinned).
   */
  def binaryTopKProbed(spark: SparkSession, queries: DataFrame, idx: Index,
      nProbe: Int, cands: Int, k: Int): DataFrame = {
    require(idx.hasIvf, s"index at ${idx.path} has no IVF codebook — " +
      "binaryTopKProbed needs one (use binaryTopK for flat indexes)")
    require(cands >= k, s"cands $cands must be >= k $k")
    val nWords = idx.dim / 32
    val cb = Similarity.collectCodebook(
      spark.read.parquet(s"${idx.path}/centroids"))
    val q = queries.select(col("id").as("qid"), col("vec").as("qvec"),
      Similarity.binaryQuantize(col("vec"), idx.dim).as("qb"),
      Similarity.norm(col("vec")).as("qn"),
      Similarity.nearestCids(col("vec"), cb, nProbe).as("probes"))
    val probes = q.select(col("qid"), col("qb"),
      explode(col("probes")).as("cid"))
    // bounded collect: distinct probed cids <= C (codebook contract);
    // their cb values become literal partition filters on BOTH reads
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0))
    val buckets = probedCids
      .map(c => ((c % idx.cbBuckets) + idx.cbBuckets) % idx.cbBuckets)
      .distinct.map(_.toInt)
    val bucketFilter = col("cb").isin(buckets.map(b => b: Any): _*)
    val lists = liveVecs(spark, idx, Seq("id", "bwords", "cid"),
      preFilter = Some(bucketFilter))
    // per query, Hamming over ITS probed lists only (each vector holds
    // one cid, so no (qid, nid) pair appears twice)
    val pre = broadcast(probes).join(lists, "cid")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        Similarity.hammingDist(col("qb"), col("bwords"), nWords).as("ham"))
    val wPre = Window.partitionBy("qid").orderBy(asc("ham"), asc("nid"))
    val shortlist = pre.withColumn("rk", row_number().over(wPre))
      .filter(col("rk") <= cands).select("qid", "nid")
    val vecs = liveVecs(spark, idx, Seq("id", "vec", "nrm"),
        preFilter = Some(bucketFilter))
      .select(col("id").as("nid"), col("vec").as("nvec"),
        col("nrm").as("cn"))
    val rer = shortlist
      .join(broadcast(q.select(col("qid"), col("qvec"), col("qn"))), "qid")
      .join(vecs, "nid")
      .select(col("qid"), col("nid"),
        round(Similarity.dot(col("qvec"), col("nvec"))
          / (col("qn") * col("cn")), 5).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    rer.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "nid", "cos")
  }

  /**
   * [[Similarity.pqSearch]] served from the generational index: ADC
   * distance lookups over the LIVE generations' code columns — the
   * scan reads only (id, code0..code{m-1}); the float vectors are
   * NEVER read (the compressed-serve contract: at a billion vectors
   * the m-byte codes fit in memory where the floats cannot, and the
   * lifecycle means corpus growth appends code rows instead of
   * re-encoding). Queries are a bounded driver-side batch, as in the
   * inline ADC path.
   */
  def pqTopK(spark: SparkSession,
      queries: Seq[(Long, Seq[Double])], idx: Index, k: Int): DataFrame = {
    val (books, subDim) = pqBooks(spark, idx)
      .getOrElse(sys.error(s"index at ${idx.path} has no PQ codebooks"))
    val cols = Seq("id") ++ books.indices.map(s => s"code$s")
    Similarity.pqSearch(liveVecs(spark, idx, cols), books, queries,
      subDim, k)
  }

  /**
   * IVFADC served from the generational index — the canonical
   * billion-vector composition (IVF prunes WORK, PQ shrinks MEMORY)
   * with the growth lifecycle: each generation holds euclidean coarse
   * assignments + RESIDUAL ADC codes, serve scans only
   * (ccid, id, code*) of the probed `cb` bucket dirs across live
   * generations, and corpus growth appends code rows. Query-side
   * tables (per-(query, probe) subspace distances on the residual
   * codebooks) are driver arithmetic riding the broadcast probes
   * frame — exactly [[Similarity.ivfPqSearch]]'s contract.
   */
  def ivfPqTopK(spark: SparkSession,
      queries: Seq[(Long, Array[Double])], idx: Index, nProbe: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val coarse = coarseBook(spark, idx)
      .getOrElse(sys.error(s"index at ${idx.path} has no coarse codebook"))
    val (books, subDim) = pqBooks(spark, idx)
      .getOrElse(sys.error(s"index at ${idx.path} has no PQ codebooks"))
    val m = books.length
    val cn2 = coarse.map(v => v.map(x => x * x).sum)
    val probeRows = queries.flatMap { case (qid, q) =>
      val ranked = coarse.zipWithIndex.map { case (c, ccid) =>
        var dot = 0.0
        var n2 = 0.0
        var j = 0
        while (j < idx.dim) { dot += q(j) * c(j); n2 += q(j) * q(j); j += 1 }
        (graft.functions.NearestCentroids.round5(
          cn2(ccid) - 2 * dot + n2), ccid.toLong)
      }.sorted.take(nProbe)
      ranked.map { case (_, ccid) =>
        val c = coarse(ccid.toInt)
        val tables = (0 until m).map { s =>
          books(s).toSeq.map { cent =>
            var d = 0.0
            var j = 0
            while (j < subDim) {
              val diff = (q(s * subDim + j) - c(s * subDim + j)) - cent(j)
              d += diff * diff
              j += 1
            }
            BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
          }
        }
        (qid, ccid, tables)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ccid",
          org.apache.spark.sql.types.LongType)) ++
      (0 until m).map(s => org.apache.spark.sql.types.StructField(
        s"t$s", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows.map { case (qid, ccid, ts) =>
        org.apache.spark.sql.Row.fromSeq(qid +: ccid +: ts)
      }: _*), schema)
    val probedBuckets = probeRows.map(_._2)
      .map(c => (((c % idx.cbBuckets) + idx.cbBuckets) % idx.cbBuckets).toInt)
      .distinct
    val codes = liveVecs(spark, idx,
      Seq("id", "ccid") ++ (0 until m).map(s => s"code$s"),
      preFilter = Some(col("cb").isin(probedBuckets.map(b => b: Any): _*)))
    Similarity.ivfPqSearch(codes, probes, m, k)
  }

  /**
   * [[Similarity.ivfTopKAssigned]] served from the generational
   * index: probes select nProbe clusters per query against the
   * INSTALLED codebook, the probed cid set (bounded <= C by the
   * codebook contract) collapses to literal `cb` bucket values, and
   * the generation scan PRUNES to those bucket directories at
   * planning time — per-batch read cost is O(probed lists) across
   * all live generations, never a corpus scan.
   */
  def ivfTopK(spark: SparkSession, queries: DataFrame, idx: Index,
      nProbe: Int, k: Int): DataFrame = {
    require(idx.hasIvf, s"index at ${idx.path} has no IVF codebook")
    val cb = Similarity.collectCodebook(
      spark.read.parquet(s"${idx.path}/centroids"))
    val probes = queries
      .select(col("id").as("qid"), col("vec").as("qvec"),
        Similarity.norm(col("vec")).as("qnrm"),
        explode(Similarity.nearestCids(col("vec"), cb, nProbe)).as("cid"))
    // bounded collect: distinct probed cids <= C (codebook contract);
    // their cb values become literal partition filters
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0))
    val buckets = probedCids
      .map(c => ((c % idx.cbBuckets) + idx.cbBuckets) % idx.cbBuckets)
      .distinct.map(_.toInt)
    val lists = liveVecs(spark, idx, Seq("id", "vec", "nrm", "cid"),
      preFilter = Some(col("cb").isin(buckets.map(b => b: Any): _*)))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    probes.join(lists, "cid")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        round(Similarity.dot(col("qvec"), col("vec"))
          / (col("qnrm") * col("nrm")), 5).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("qid", "nid", "cos")
  }
}
