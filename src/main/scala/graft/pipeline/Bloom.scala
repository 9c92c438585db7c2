package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed Bloom-filter semi-join pre-filter — the runtime-filter
 * pattern: build a compact bit-set over the SMALL side's join keys,
 * broadcast it (here: a literal array of longs), and pre-filter the
 * BIG side before the exact join, so the shuffle carries candidate
 * rows only. Spark's own runtime row-group filtering applies the same
 * idea inside AQE but cannot be forced or inspected; this form makes
 * the filter an explicit, engine-checkable operator.
 *
 * Hashing is md5-derived (`conv(substring(md5(key || '#' || h)))`) so
 * the whole construction is a pure codegen'd Catalyst expression —
 * no UDF, no JVM-private sketch class (`df.stat.bloomFilter` builds
 * one driver-side, but probing it needs a ScalaUDF and its layout is
 * engine-private). k independent hash functions come from salting the
 * key with '#0'..'#k-1'.
 *
 * False positives are possible by construction (the exact join after
 * the pre-filter removes them); false negatives are impossible — the
 * property the q_bloom_join oracle certifies by equating the
 * pre-filtered pipeline with a plain exact semi-join.
 */
object Bloom {

  /** Bit position of hash `h` for `keyCol`, as a SQL string — both
    * build and probe evaluate the SAME expression text, so positions
    * agree by construction. 15 hex digits of md5 < 2^60, so the cast
    * is positive and the modulo unbiased to ~2^-48. */
  private def posSql(keyCol: String, h: Int, mBits: Int): String =
    s"CAST(CAST(conv(substring(md5(concat($keyCol, '#$h')), 1, 15), " +
      s"16, 10) AS BIGINT) % $mBits AS INT)"

  /** Build the filter over the distinct values of `keyCol`: one
    * explode to k positions per key, one `bit_or` aggregate into
    * mBits/64 lanes, one BOUNDED driver collect (128 longs at the
    * default 8192 bits — the broadcast-small-side contract). */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 8192,
      kHashes: Int = 3): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    val lanes = keys
      .select(explode(array((0 until kHashes)
        .map(h => expr(posSql(keyCol, h, mBits))): _*)).as("pos"))
      .select(expr("pos div 64").cast("int").as("lane"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("bit"))
      .groupBy("lane").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    lanes.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate for `keyCol` against a built filter: all k
    * bits set. A pure expression over a literal array — codegen'd,
    * shipped with the plan, no broadcast machinery needed at this
    * size. */
  def mightContain(keyCol: String, lanes: Array[Long], mBits: Int = 8192,
      kHashes: Int = 3): Column = {
    require(lanes.length == mBits / 64,
      s"lane count ${lanes.length} != $mBits/64")
    val lanesSql = lanes.mkString("array(", "L, ", "L)")
    (0 until kHashes).map { h =>
      val p = posSql(keyCol, h, mBits)
      expr(s"(shiftright(element_at($lanesSql, CAST($p div 64 AS INT) + 1), " +
        s"$p % 64) & CAST(1 AS BIGINT)) = 1")
    }.reduce(_ && _)
  }
}
