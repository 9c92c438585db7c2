package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, batch-oriented decode/feature-extract
 * over `mapPartitions`.
 *
 * Images decode for REAL through [[ImageIoDecoder]] (the JVM's
 * built-in `javax.imageio` codecs — PNG/JPEG/GIF/BMP), audio through
 * [[WavDecoder]] (`javax.sound.sampled` — WAV/AIFF/AU PCM), and video
 * through [[y4mFrames]] ([[Y4m]] — YUV4MPEG2 container parsing with
 * the format's own FRAME-marker framing), all with zero external
 * libraries. Compressed video codecs (H.264 …) are not available in
 * this container; a compressed decoder would slot into the per-frame
 * step of [[y4mFrames]], and [[FakeDecoder]] remains the stand-in for
 * the text-payload testdata path. Everything around the decoders —
 * schema, batch shape, partitioning, the narrow `mapPartitions`
 * execution — is identical either way.
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

  /**
   * REAL video container decode: YUV4MPEG2 (Y4M — the mjpegtools
   * uncompressed interchange format, the video analog of WAV PCM).
   * Pure-JVM parsing of the published layout: the `YUV4MPEG2 W.. H..`
   * stream header, then per frame a `FRAME` marker line followed by
   * planar 4:2:0 data — so frame boundaries come from the CONTAINER'S
   * OWN FRAMING (marker walk with per-frame validation, fail-loud on
   * corrupt streams), not fixed-size chunking. Compressed codecs
   * (H.264 etc.) still aren't in this container; what this closes is
   * the container/framing half of the video path — a compressed
   * decoder would slot into the per-frame step exactly where the luma
   * fold sits.
   *
   * Emits one row per `stride`-th frame: (id, frameIdx, w, h,
   * lumaSum) — the luma fold is an exact integer sum over the Y
   * plane, so an oracle can replay it from a pixel formula and any
   * byte-level parsing error hash-diverges.
   */
  def y4mFrames(records: Dataset[MediaRecord], stride: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val (w, h, hdrLen) = Y4m.parseHeader(r.content)
      Y4m.frameOffsets(r.content, hdrLen, w, h).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (off, i) =>
          var s = 0L
          var p = 0
          val n = w * h
          while (p < n) { s += (r.content(off + p) & 0xFF); p += 1 }
          (r.id, i, w, h, s)
        }
    }.toDF("id", "frameIdx", "w", "h", "lumaSum")
  }
}

/** YUV4MPEG2 container parsing (header + frame-marker walk) and the
  * matching writer for deterministic fixtures. Layout per the
  * mjpegtools spec: ASCII stream header `YUV4MPEG2 W<w> H<h> F<n>:<d>
  * …\n`, then for each frame the ASCII marker line `FRAME[ params]\n`
  * followed by w*h luma bytes + two (w/2)*(h/2) chroma planes
  * (C420). */
object Y4m {

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")
  private val FrameMagic = "FRAME".getBytes("US-ASCII")

  private def startsWith(b: Array[Byte], off: Int,
      prefix: Array[Byte]): Boolean =
    off + prefix.length <= b.length &&
      prefix.indices.forall(i => b(off + i) == prefix(i))

  /** Parse the stream header: (width, height, header length incl.
    * terminating newline). Fail-loud on anything malformed. */
  def parseHeader(b: Array[Byte]): (Int, Int, Int) = {
    require(startsWith(b, 0, Magic), "not a YUV4MPEG2 stream")
    var i = Magic.length
    while (i < b.length && b(i) != '\n') i += 1
    require(i < b.length, "unterminated Y4M stream header")
    val params = new String(b, Magic.length, i - Magic.length, "US-ASCII")
      .trim.split("\\s+")
    def tagged(t: Char): Option[String] =
      params.find(p => p.nonEmpty && p.head == t).map(_.tail)
    val w = tagged('W').map(_.toInt)
      .getOrElse(sys.error("Y4M header missing width"))
    val h = tagged('H').map(_.toInt)
      .getOrElse(sys.error("Y4M header missing height"))
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"unsupported Y4M geometry ${w}x$h (4:2:0 needs even dims)")
    tagged('C').foreach(cs => require(cs.startsWith("420"),
      s"unsupported Y4M chroma subsampling C$cs (only 4:2:0)"))
    (w, h, i + 1)
  }

  /** Offsets of each frame's luma plane, from the container's own
    * FRAME markers — validates every marker and the final frame's
    * completeness. */
  def frameOffsets(b: Array[Byte], hdrLen: Int, w: Int,
      h: Int): Iterator[Int] = {
    val frameBytes = w * h + 2 * ((w / 2) * (h / 2))
    new Iterator[Int] {
      private var pos = hdrLen
      def hasNext: Boolean = pos < b.length
      def next(): Int = {
        require(startsWith(b, pos, FrameMagic),
          s"corrupt Y4M stream: no FRAME marker at offset $pos")
        var i = pos + FrameMagic.length
        while (i < b.length && b(i) != '\n') i += 1
        require(i < b.length, "unterminated Y4M FRAME marker")
        val data = i + 1
        require(data + frameBytes <= b.length,
          s"truncated Y4M frame at offset $data")
        pos = data + frameBytes
        data
      }
    }
  }

  /** Write a Y4M stream from per-frame luma planes (chroma = neutral
    * 128): the deterministic-fixture encoder for the oracle query and
    * specs. */
  def encode(w: Int, h: Int, lumaPlanes: Seq[Array[Byte]]): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, s"even dims required: ${w}x$h")
    val chroma = (w / 2) * (h / 2)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    lumaPlanes.foreach { y =>
      require(y.length == w * h, s"luma plane ${y.length} != ${w * h}")
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(y)
      var i = 0
      while (i < 2 * chroma) { bos.write(128); i += 1 }
    }
    bos.toByteArray
  }
}
