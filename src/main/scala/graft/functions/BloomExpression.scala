package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Bloom-filter membership test over a string key: ONE md5
 * digest per row, k bit positions by double hashing (Kirsch &
 * Mitzenmacher 2006) from the digest's two 60-bit halves.
 *
 * Why native and not SQL text: the declarative form
 * (`conv(substring(md5(key),...))` per position) re-evaluates the
 * digest at every syntactic occurrence — the position appears in both
 * the lane index and the bit shift of every one of the k tests, and
 * Catalyst inlines deterministic projections when pushing the filter
 * toward the scan, so the "share the digest via withColumn" trick
 * collapses back to 2k digests per row. A single expression node
 * cannot be split, and its generated code computes the digest once.
 *
 * Position arithmetic is bit-identical to [[graft.pipeline.Bloom]]'s
 * SQL build side: h1 = digest hex nibbles 0-14, h2 = nibbles 15-29
 * (both < 2^60), position_i = (h1 + i*h2) mod mBits.
 */
case class BloomMightContain(child: Expression, lanes: Array[Long],
    mBits: Int, kHashes: Int) extends UnaryExpression {

  require(mBits % 64 == 0 && lanes.length == mBits / 64,
    s"lane count ${lanes.length} != $mBits/64")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    BloomMightContain.compute(v.asInstanceOf[UTF8String], lanes, mBits,
      kHashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bloomLanes", lanes, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomMightContain.compute(" +
        s"$v, $l, $mBits, $kHashes);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}

object BloomMightContain {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def beLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Shared by eval and codegen. Digest once; h1 = nibbles 0-14
    * (first 8 bytes big-endian, low nibble dropped), h2 = nibbles
    * 15-29 (bytes 7-14 big-endian, top nibble masked) — exactly
    * `conv(substring(md5(key), 1|16, 15), 16, 10)`. */
  def compute(s: UTF8String, lanes: Array[Long], mBits: Int,
      kHashes: Int): Boolean = {
    val digest = md5.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val h1 = beLong(d, 0) >>> 4
    val h2 = beLong(d, 7) & 0x0fffffffffffffffL
    var h = 0
    while (h < kHashes) {
      val pos = ((h1 + h.toLong * h2) % mBits).toInt
      if (((lanes(pos >> 6) >>> (pos & 63)) & 1L) == 0L) return false
      h += 1
    }
    true
  }
}
