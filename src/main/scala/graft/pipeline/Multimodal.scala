package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, batch-oriented decode/feature-extract
 * over `mapPartitions`.
 *
 * Images decode for REAL through [[ImageIoDecoder]] (the JVM's
 * built-in `javax.imageio` codecs — PNG/JPEG/GIF/BMP) and audio
 * through [[WavDecoder]] (`javax.sound.sampled` — WAV/AIFF/AU PCM),
 * both with zero external libraries. Compressed video codecs are not
 * available in this container, so [[FakeDecoder]] remains the
 * deterministic stand-in for that modality (and the oracle path over
 * the text-payload testdata); everything around the decoder — schema,
 * batch shape, partitioning, the narrow `mapPartitions` execution —
 * is identical either way, so swapping in a real video codec touches
 * only `MediaDecoder.decode`.
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

  /** REAL image decoder over the JVM's built-in codecs
    * (`javax.imageio`: PNG, JPEG, GIF, BMP — no external libraries):
    * payload -> BufferedImage -> `grid` x `grid` mean-luma descriptor
    * in [0, 1] (Rec.601 luma, pixels block-averaged into the grid).
    * An undecodable payload fails loudly — a corrupt image must fail
    * the job, not yield a plausible zero descriptor. Decoder instances
    * are per-partition (see [[extractFeatures]]), and the in-memory
    * stream path never touches ImageIO's disk cache. */
  final class ImageIoDecoder(val grid: Int = 4) extends MediaDecoder {
    override def descriptorSize: Int = grid * grid
    override def decode(content: Array[Byte]): Array[Float] = {
      // MemoryCacheImageInputStream keeps the decode off ImageIO's disk
      // cache; ImageIO.read closes the stream itself when done
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(content)))
      if (img == null) {
        throw new IllegalArgumentException(
          s"undecodable image payload (${content.length} bytes)")
      }
      val w = img.getWidth; val h = img.getHeight
      val sums = new Array[Double](grid * grid)
      val counts = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        val gy = math.min(y * grid / h, grid - 1)
        var x = 0
        while (x < w) {
          val gx = math.min(x * grid / w, grid - 1)
          val rgb = img.getRGB(x, y)
          val luma = 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          sums(gy * grid + gx) += luma
          counts(gy * grid + gx) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](grid * grid)
      var i = 0
      while (i < out.length) {
        out(i) =
          if (counts(i) == 0) 0f
          else (sums(i) / counts(i) / 255.0).toFloat
        i += 1
      }
      out
    }
  }

  /** REAL audio decoder over the JVM's built-in `javax.sound.sampled`
    * codecs (WAV/AIFF/AU PCM — no external libraries): payload -> PCM
    * frames -> per-segment RMS envelope descriptor in [0, 1]
    * (`segments` values; channels mixed down to mono; 16-bit signed
    * and 8-bit samples supported). Undecodable or non-PCM payloads
    * fail loudly, like [[ImageIoDecoder]] — a corrupt clip must fail
    * the job, not yield a plausible silent descriptor. */
  final class WavDecoder(val segments: Int = 8) extends MediaDecoder {
    override def descriptorSize: Int = segments
    override def decode(content: Array[Byte]): Array[Float] = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"undecodable audio payload (${content.length} bytes)", e)
        }
      val fmt = in.getFormat
      val bytes =
        try in.readAllBytes()
        finally in.close()
      val ch = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      require(bits == 16 || bits == 8,
        s"unsupported sample size: $bits bits")
      val signed =
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      require(signed ||
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        s"unsupported encoding: ${fmt.getEncoding}")
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      val nFrames = bytes.length / frameBytes
      require(nFrames > 0, "empty audio payload")
      val big = fmt.isBigEndian
      val sums = new Array[Double](segments)
      val counts = new Array[Long](segments)
      var f = 0
      while (f < nFrames) {
        val seg = math.min(f * segments / nFrames, segments - 1)
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = f * frameBytes + c * bytesPerSample
          val s =
            if (bits == 16) {
              val lo = bytes(off + (if (big) 1 else 0)) & 0xFF
              val hi = bytes(off + (if (big) 0 else 1)).toInt
              ((hi << 8) | lo).toShort / 32768.0
            } else if (signed) bytes(off) / 128.0
            else ((bytes(off) & 0xFF) - 128) / 128.0
          acc += s
          c += 1
        }
        val v = acc / ch
        sums(seg) += v * v
        counts(seg) += 1
        f += 1
      }
      val out = new Array[Float](segments)
      var i = 0
      while (i < segments) {
        out(i) =
          if (counts(i) == 0) 0f
          else math.sqrt(sums(i) / counts(i)).toFloat
        i += 1
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
