package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines: exact (hash
 * groupBy), n-gram Jaccard via an inverted-index join, MinHash + LSH
 * banding, and SimHash. All are declarative DataFrame plans — Catalyst
 * handles partial aggregation, and the joins are standard shuffled
 * hash/sort-merge joins on high-cardinality keys (token, band), which is
 * exactly the shape that scales: candidate generation is O(postings),
 * never O(n^2) over documents.
 *
 * Hash functions are pure arithmetic over a rank-based vocabulary id so
 * that an independent SQL engine (the DuckDB oracle) reproduces results
 * bit-for-bit; swapping in xxhash64 keeps the plan identical.
 */
object Dedup {

  /** MinHash parameters: k universal hashes h_i(x) = (a_i*x + b_i) mod p. */
  val MinhashP: Long = 2147483647L
  val MinhashA: Array[Long] = Array(7L, 13L, 31L, 61L, 127L, 251L, 509L,
    1021L, 2039L, 4093L, 8191L, 16381L, 32749L, 65521L, 131071L, 262139L)
  val MinhashB: Array[Long] = Array(3L, 17L, 29L, 53L, 101L, 211L, 401L,
    809L, 1601L, 3203L, 6421L, 12809L, 25603L, 51203L, 102407L, 204803L)
  val NumHashes: Int = MinhashA.length // 16
  val BandSize: Int = 4                // -> 4 bands

  /**
   * Exact deduplication: every row mapped to the minimum id sharing its
   * content hash. `keeper == id` marks the row to keep. One shuffle on
   * the content hash; at 100 TB this is the canonical hash-partition
   * dedup (the window's partition key is the md5, so skew = true
   * duplicate mass).
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol)))
    df.select(col(idCol), min(col(idCol)).over(w).as("keeper"))
  }

  /** (id, token) postings with per-document distinct tokens. */
  private def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))

  /**
   * N-gram (word shingle) Jaccard similarity over all candidate pairs
   * sharing at least one shingle — inverted-index join, partial-agg
   * friendly. Returns (ida, idb, jaccard) for pairs >= `threshold`.
   * For n = 1 this is token-set Jaccard.
   */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val sizes = sh.groupBy("id").agg(count("*").as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(count("*").as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("sz", "sa"), "ida")
      .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("sz", "sb"), "idb")
      .select(col("ida"), col("idb"),
        round(col("i").cast("double") / (col("sa") + col("sb") - col("i")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** (id, tok) distinct word n-gram shingles. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    if (n <= 1) postings(df, idCol, textCol)
    else {
      val toks = split(col(textCol), " ")
      val grams = transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " "))
      df.select(col(idCol).as("id"),
        explode(array_distinct(grams)).as("tok"))
    }
  }

  /**
   * Rank-based vocabulary ids: token -> dense rank in lexicographic
   * order. The vocabulary is orders of magnitude smaller than the corpus
   * and broadcast back; at larger scale substitute xxhash64(tok) and drop
   * this pass entirely (plan shape unchanged).
   */
  def vocabIds(post: DataFrame): DataFrame =
    post.select("tok").distinct()
      .withColumn("tokId", dense_rank().over(Window.orderBy("tok")).cast("long"))

  /**
   * MinHash signatures: for each document and hash i, the minimum of
   * (a_i * tokId + b_i) mod p over the document's token set.
   * Output: (id, hashIdx, minv).
   */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val post = postings(df, idCol, textCol)
    val vocab = vocabIds(post)
    val hp = post.sparkSession.createDataFrame(
      (0 until NumHashes).map(i => (i, MinhashA(i), MinhashB(i))))
      .toDF("hashIdx", "a", "b")
    post.join(broadcast(vocab), "tok")
      .join(broadcast(hp))
      .groupBy(col("id"), col("hashIdx"))
      .agg(min((col("a") * col("tokId") + col("b")) % MinhashP).as("minv"))
  }

  /**
   * MinHash + LSH near-duplicate candidates: band the k signatures into
   * k/BandSize bands, bucket-join on (band, band-signature), verify
   * candidates with exact token-set Jaccard. Returns (ida, idb, jaccard)
   * >= threshold. The self-join is on band buckets (high cardinality),
   * never all-pairs — the standard web-scale dedup topology.
   */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol)
    val bands = sigs
      .withColumn("band", floor(col("hashIdx") / BandSize))
      .groupBy("id", "band")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("hashIdx"), col("minv")))),
        s => s.getField("minv")), ",").as("bkey"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .distinct()
    val post = postings(df, idCol, textCol)
    val sizes = post.groupBy("id").agg(count("*").as("sz"))
    val inter = cands.join(post.withColumnRenamed("id", "ida"), "ida")
      .join(post.withColumnRenamed("id", "idb").withColumnRenamed("tok", "tokb"), "idb")
      .filter(col("tok") === col("tokb"))
      .groupBy("ida", "idb").agg(count("*").as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("sz", "sa"), "ida")
      .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("sz", "sb"), "idb")
      .select(col("ida"), col("idb"),
        round(col("i").cast("double") / (col("sa") + col("sb") - col("i")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash parameters (single universal hash over vocab ids whose bits
    * are the hyperplane signs). */
  val SimhashBits: Int = 32
  val SimhashA: Long = 1103515245L
  val SimhashB: Long = 12345L

  /**
   * 32-bit SimHash per document: bit k is set iff the count of tokens
   * whose hashed bit k is 1 strictly exceeds those with 0.
   * Output: (id, simhash: long).
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val post = postings(df, idCol, textCol)
    val vocab = vocabIds(post)
    val h = (lit(SimhashA) * col("tokId") + lit(SimhashB)) % lit(MinhashP)
    val bits = post.sparkSession.createDataFrame(
      (0 until SimhashBits).map(Tuple1(_))).toDF("bit")
    post.join(broadcast(vocab), "tok")
      .join(broadcast(bits))
      .withColumn("sign",
        when(floor(h / pow(lit(2.0), col("bit"))).cast("long") % 2 === 1, 1)
          .otherwise(-1))
      .groupBy("id", "bit").agg(sum("sign").as("s"))
      .groupBy("id")
      .agg(sum(when(col("s") > 0,
        pow(lit(2.0), col("bit")).cast("long")).otherwise(0L)).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance <= maxDist.
    * All-pairs compare is restricted to same-band prefixes in real
    * deployments; here candidates sharing the top 16 bits. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val sig = simhash(df, idCol, textCol)
      .withColumn("prefix", floor(col("simhash") / 65536L))
    sig.as("a").join(sig.as("b"),
        col("a.prefix") === col("b.prefix") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
