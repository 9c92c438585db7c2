package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, batch-oriented decode/feature-extract
 * over `mapPartitions`.
 *
 * The decode step itself is STUBBED (this container has no image/audio
 * codecs): [[FakeDecoder]] is a deterministic stand-in with the same
 * signature a real decoder would have. Everything around it — schema,
 * batch shape, partitioning, the narrow `mapPartitions` execution — is
 * real and tested. Swapping in an actual codec touches only
 * `MediaDecoder.decode`.
 */
object Multimodal {

  /** Canonical media-record schema: opaque payload + typed metadata. */
  final case class MediaRecord(
      id: Long,
      modality: String,          // "image" | "audio" | "video" | "text"
      content: Array[Byte],
      meta: Map[String, String])

  /** Extracted feature row (fixed-size descriptor per record). */
  final case class MediaFeatures(
      id: Long,
      modality: String,
      nBytes: Long,
      byteEntropy: Double,
      descriptor: Array[Float])

  /** A decoder turns raw payload bytes into a fixed-size descriptor.
    * Real implementations (JPEG decode + resize, PCM frame sampling,
    * video keyframe extraction) plug in here; they see one partition's
    * records as a batch iterator, so per-batch model/codec init is
    * amortized exactly like a Pandas-UDF batch. */
  trait MediaDecoder extends Serializable {
    def descriptorSize: Int
    def decode(content: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decoder: descriptor = normalized histogram of
    * byte values folded into `descriptorSize` bins. Stands in for the
    * real codec (unavailable in this environment) with identical
    * plumbing. */
  final class FakeDecoder(val descriptorSize: Int = 16) extends MediaDecoder {
    override def decode(content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](descriptorSize)
      var i = 0
      while (i < content.length) {
        out((content(i) & 0xFF) % descriptorSize) += 1f
        i += 1
      }
      if (content.length > 0) {
        var j = 0
        while (j < descriptorSize) { out(j) /= content.length; j += 1 }
      }
      out
    }
  }

  /** Shannon entropy of the payload's byte distribution (bits/byte). */
  def byteEntropy(content: Array[Byte]): Double = {
    if (content.isEmpty) return 0.0
    val freq = new Array[Long](256)
    var i = 0
    while (i < content.length) { freq(content(i) & 0xFF) += 1; i += 1 }
    graft.core.InfoTheory.entropy(freq, content.length.toLong)
  }

  /** Wrap the documents table as a media table (text payload encoded as
    * UTF-8 binary) — the test stand-in for an image/audio corpus. */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] =
    asMedia(spark.read.parquet(s"$dir/documents.parquet"))

  /** Wrap any (doc_id, text, lang, source) frame as a media table. */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .map { r =>
        MediaRecord(r.getLong(0), "text",
          r.getString(1).getBytes("UTF-8"),
          Map("lang" -> r.getString(2), "source" -> r.getString(3)))
      }
  }

  /**
   * Batch feature extraction: one pass, narrow, decoder initialized once
   * per partition (the Spark-side analogue of `mapInPandas` batches).
   */
  def extractFeatures(records: Dataset[MediaRecord],
      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition (per-batch) decoder init happens here
      it.map { r =>
        MediaFeatures(r.id, r.modality, r.content.length.toLong,
          byteEntropy(r.content), decoder.decode(r.content))
      }
    }
  }

  /** Frame sampling plumbing: every `stride`-th fixed-size frame of the
    * payload (a video/audio would substitute codec framing). Returns
    * (id, frameIdx, frame) — the explode shape downstream models consume. */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.id, idx, frame) }
    }.toDF("id", "frameIdx", "frame")
  }
}
