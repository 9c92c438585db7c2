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

  /** Build the postings index: (tb, tok, id, tf) partitioned by token
    * hash bucket, tok-sorted within files. tf (term frequency) rides
    * along so queries can score without touching the documents. */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Index = {
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("tb", bucketOf(col("tok"), nBuckets))
      .repartition(col("tb")).sortWithinPartitions("tok")
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/post")
    Index(path, nBuckets)
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
}
