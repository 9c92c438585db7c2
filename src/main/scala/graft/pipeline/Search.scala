package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Inverted-index text search AT REST — the serve path of a corpus
 * search/retrieval system. The index is a token-bucket-partitioned
 * parquet postings table (the same bucket-at-rest layout as
 * [[Dedup.jaccardRestInit]] and the IVF index in Similarity): a
 * conjunctive query reads ONLY its terms' buckets (static partition
 * pruning on literal bucket values) and, inside each bucket file,
 * only the row groups whose tok min/max straddle a query term
 * (postings are written tok-sorted). At 100 TB the per-query read is
 * O(matched postings), never a corpus scan — index build cost is one
 * explode + one groupBy, paid once and amortized over every query.
 */
object Search {

  final case class Index(path: String, nBuckets: Int)

  private def bucketOf(c: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(c), lit(n)).cast("int")

  /** Build the postings index: (tb, tok, id, tf, dlen) partitioned by
    * token hash bucket, tok-sorted within files. tf (term frequency)
    * and dlen (doc token count — the Lucene norm-in-postings trick)
    * ride along so queries score without touching the documents table;
    * `stats` holds the two corpus constants BM25 needs (N, avgdl as an
    * exact integer-sum ratio, so any engine recomputes it bit-equal). */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Index = {
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")),
        size(split(col(textCol), " ")).cast("long").as("dlen"))
    toks.groupBy("id", "tok")
      .agg(count(lit(1)).as("tf"), first("dlen").as("dlen"),
        collect_list(col("pos")).as("positions"))
      .withColumn("tb", bucketOf(col("tok"), nBuckets))
      .repartition(col("tb")).sortWithinPartitions("tok")
      // small row groups so the tok-sorted min/max skipping actually
      // bites inside fat buckets (the 128 MB default makes one group
      // per file, turning every term probe into a full-bucket decode)
      .write.mode("overwrite").option("parquet.block.size", 1 << 20)
      .partitionBy("tb").parquet(s"$path/post")
    df.select(size(split(col(textCol), " ")).cast("long").as("dlen"))
      .agg(count(lit(1)).as("n_docs"), sum("dlen").as("sum_dlen"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    Index(path, nBuckets)
  }

  /**
   * Incremental index ingest: fold a NEW shard of documents into an
   * existing index. The shard's postings append into the same
   * bucket-partitioned layout (a bucket is a directory — appends never
   * rewrite existing files), and the two corpus constants accumulate
   * exactly (integer sums), so BM25 over the appended index equals a
   * full rebuild bit-for-bit. Ingest cost is O(shard), never
   * O(corpus) — the same at-rest fold contract as
   * [[Dedup.jaccardRestMerge]].
   *
   * Caller contract (documented, not scanned-for): shard doc ids must
   * be NEW — this is append-only ingest; updating a doc needs a
   * delete+reingest cycle or the versioned-table overlay. Single
   * writer, like every at-rest state here: the stats rewrite is not
   * atomic with the postings append.
   */
  def append(df: DataFrame, idCol: String, textCol: String,
      idx: Index): Index = {
    val spark = df.sparkSession
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")),
        size(split(col(textCol), " ")).cast("long").as("dlen"))
    toks.groupBy("id", "tok")
      .agg(count(lit(1)).as("tf"), first("dlen").as("dlen"),
        collect_list(col("pos")).as("positions"))
      .withColumn("tb", bucketOf(col("tok"), idx.nBuckets))
      .repartition(col("tb")).sortWithinPartitions("tok")
      .write.mode("append").option("parquet.block.size", 1 << 20)
      .partitionBy("tb").parquet(s"${idx.path}/post")
    val old = spark.read.parquet(s"${idx.path}/stats").head()
    val delta = df.select(size(split(col(textCol), " ")).cast("long")
        .as("dlen"))
      .agg(count(lit(1)).as("n_docs"), sum("dlen").as("sum_dlen")).head()
    import spark.implicits._
    Seq((old.getLong(0) + delta.getLong(0), old.getLong(1) + delta.getLong(1)))
      .toDF("n_docs", "sum_dlen")
      .coalesce(1).write.mode("overwrite").parquet(s"${idx.path}/stats")
    idx
  }

  /** Conjunctive (AND-of-terms) search: docs containing EVERY query
    * term, scored by summed term frequency. Term buckets are computed
    * by running the index's own bucket expression on a literal frame —
    * never re-implemented driver-side — then pushed as literal
    * partition filters so planning-time pruning keeps the scan to
    * |terms| buckets. */
  def searchAll(spark: SparkSession, idx: Index, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    import spark.implicits._
    val buckets = terms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    spark.read.parquet(s"${idx.path}/post")
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
      .groupBy("id")
      .agg(count_distinct(col("tok")).as("nhit"), sum("tf").as("score"))
      .filter(col("nhit") === terms.length)
      .select(col("id"), col("score"))
  }

  /**
   * Disjunctive search with a minimum-should-match: docs containing at
   * least `minMatch` of the terms, scored by summed tf and matched-term
   * count. minMatch = terms.length degrades to [[searchAll]];
   * minMatch = 1 is plain OR. Same bucket-pruned read.
   */
  def searchAny(spark: SparkSession, idx: Index, terms: Seq[String],
      minMatch: Int): DataFrame = {
    require(minMatch >= 1 && minMatch <= terms.length,
      s"minMatch $minMatch out of range for ${terms.length} terms")
    import spark.implicits._
    val buckets = terms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    spark.read.parquet(s"${idx.path}/post")
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
      .groupBy("id")
      .agg(count_distinct(col("tok")).as("nhit"), sum("tf").as("score"))
      .filter(col("nhit") >= minMatch)
      .select(col("id"), col("nhit"), col("score"))
  }

  /**
   * Exact phrase search: docs where the terms appear CONSECUTIVELY, with
   * the occurrence count. Positions ride in the postings rows, so the
   * classic positional-index algorithm runs on the same bucket-pruned
   * read as every other query: explode each matched term's positions,
   * normalize to the would-be anchor (pos - term offset), and an anchor
   * hit by all |terms| offsets is one phrase occurrence. Cost is
   * O(matched postings positions) — never a text rescan.
   */
  def searchPhrase(spark: SparkSession, idx: Index,
      terms: Seq[String]): DataFrame = {
    require(terms.length >= 2, "phrase needs at least two terms")
    import spark.implicits._
    val termIdx = terms.zipWithIndex.toDF("tok", "ti")
    val distinctTerms = terms.distinct
    val buckets = distinctTerms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    spark.read.parquet(s"${idx.path}/post")
      .filter(col("tb").isin(buckets: _*)
        && col("tok").isin(distinctTerms: _*))
      .join(termIdx, "tok")
      .select(col("id"), col("ti"), explode(col("positions")).as("pos"))
      .withColumn("anchor", col("pos") - col("ti"))
      .groupBy("id", "anchor")
      .agg(count_distinct(col("ti")).as("nt"))
      .filter(col("nt") === terms.length)
      .groupBy("id").agg(count(lit(1)).as("occurrences"))
  }

  /** BM25 parameters (the standard Robertson defaults). */
  val Bm25K1: Double = 1.2
  val Bm25B: Double = 0.75

  /**
   * BM25-ranked disjunctive (OR-of-terms) search: top-k docs by the
   * Lucene-variant BM25 score (idf = ln((N-df+0.5)/(df+0.5) + 1), never
   * negative). Same bucket-pruned postings read as [[searchAll]]; df
   * per term falls out of the already-filtered postings (a term's df IS
   * its postings count), and dlen rides in the postings row, so the
   * serve path touches nothing but |terms| buckets plus a 1-row stats
   * read. Scores are rounded before the id-tie-broken rank so the
   * exact top-k is reproducible across engines.
   */
  def searchBm25(spark: SparkSession, idx: Index, terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    import spark.implicits._
    val st = spark.read.parquet(s"${idx.path}/stats").head()
    val nDocs = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / nDocs
    val buckets = terms.toDF("tok")
      .select(bucketOf(col("tok"), idx.nBuckets).as("tb"))
      .distinct().as[Int].collect().toSeq
    val post = spark.read.parquet(s"${idx.path}/post")
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
    val dfPerTerm = post.groupBy("tok").agg(count(lit(1)).as("dfc"))
    post.join(dfPerTerm, "tok")
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("dfc") + 0.5) / (col("dfc") + 0.5)
          + 1.0))
      .withColumn("s",
        col("idf") * (col("tf") * (Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1)
            * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dlen") / avgdl)))
      .groupBy("id").agg(round(sum("s"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}
