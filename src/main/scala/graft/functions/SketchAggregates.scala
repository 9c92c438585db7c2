package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native HyperLogLog aggregate: the whole sketch state is ONE 2^b-byte
 * register buffer per group, updated in place and merged byte-wise —
 * versus the declarative register-table form
 * ([[graft.pipeline.Sketches.hllRegisters]]) whose shuffle state is up
 * to m = 2^b ROWS per group per partition. At profile shapes with many
 * groups (per-day, per-source cardinality over an event log) that is a
 * ~m× reduction in shuffle rows and agg hash-table entries; the
 * register-table form remains the AT-REST state (shard folds of
 * persisted sketches), this is the serve/profile path.
 *
 * BIT-COMPATIBLE with the register-table build and therefore with the
 * q_distinct_hll oracle: identical md5-derived 60-bit hash split
 * (top b bits index the register, next 48 bits are the rank value —
 * reference layout pinned by SketchesSpec), identical rho
 * (49 - bitLength(v), the `length(bin(v))` integer form), identical
 * alpha / linear-counting estimate algebra in java.lang.Math — the
 * same libm Spark's `pow`/`log` Columns call.
 */
case class HllSketchAgg(child: Expression, b: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(b >= 4 && b <= 12,
    s"b = $b out of range: need 4 <= b <= 12 (16..4096 registers)")

  private def m: Int = 1 << b

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch_agg expects string, got $other")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h60 = HllSketchAgg.hash60(v.asInstanceOf[UTF8String])
      val bucket = (h60 >>> (60 - b)).toInt
      val value = (h60 >>> (12 - b)) & ((1L << 48) - 1)
      val rho = (if (value == 0L) 49
        else 49 - (64 - java.lang.Long.numberOfLeadingZeros(value))).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if (other(i) > a(i)) a(i) = other(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // identical algebra to Sketches.hllEstimate: absent registers
    // (byte 0 — present ones always have rho >= 1) contribute 2^0
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < buf.length) {
      z += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val eRaw = alpha * m * m / z
    val est = if (eRaw <= 2.5 * m && zeros > 0)
      m.toDouble * java.lang.Math.log(m.toDouble / zeros)
    else eRaw
    java.lang.Math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllSketchAgg = copy(child = newChild)

  override def prettyName: String = "graft_hll_sketch"
}

object HllSketchAgg {

  /** First 60 bits of md5 (15 hex digits) as a non-negative long —
    * the exact value of `conv(substring(md5(x), 1, 15), 16, 10)`. */
  private[functions] def hash60(s: UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes)
    // first 8 digest bytes as a big-endian unsigned long, top 60 bits
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
