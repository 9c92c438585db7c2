package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/**
 * Distributed Bloom-filter semi-join pre-filter — the runtime-filter
 * pattern: build a compact bit-set over the SMALL side's join keys,
 * broadcast it (here: a literal array of longs riding in the plan),
 * and pre-filter the BIG side before the exact join, so the shuffle
 * carries candidate rows only. Spark's own runtime row-group
 * filtering applies the same idea inside AQE but cannot be forced or
 * inspected; this form makes the filter an explicit, engine-checkable
 * operator.
 *
 * The build side is pure SQL (md5 + conv — the bounded small side
 * can afford it); the probe side is the native
 * [[graft.functions.BloomMightContain]] expression: ONE md5 digest
 * per row, k positions by double hashing (Kirsch & Mitzenmacher
 * 2006, "Less hashing, same performance") from the digest's two
 * 60-bit halves — the declarative probe re-evaluated the digest at
 * every syntactic position occurrence (2k per row once Catalyst
 * inlines the projection into the pushed-down filter). Both sides
 * compute positions from the same digest nibbles, so they agree by
 * construction. No UDF, no JVM-private sketch class
 * (`df.stat.bloomFilter` builds one driver-side, but probing it
 * needs a ScalaUDF and its layout is engine-private).
 *
 * False positives are possible by construction (the exact join after
 * the pre-filter removes them); false negatives are impossible — the
 * property the q_bloom_join oracle certifies by equating the
 * pre-filtered pipeline with a plain exact semi-join.
 */
object Bloom {

  /** h1/h2: the md5 digest's hex nibbles 0-14 and 15-29 as BIGINTs
    * (< 2^60 each, so h1 + (k-1)*h2 stays well inside BIGINT). */
  private def halfSql(keyCol: String, off: Int): String =
    s"CAST(conv(substring(md5($keyCol), $off, 15), 16, 10) AS BIGINT)"

  /** Build the filter over the distinct values of `keyCol`: one md5
    * per key projected into halves, one explode to k double-hashed
    * positions, one `bit_or` aggregate into mBits/64 lanes, one
    * BOUNDED driver collect (128 longs at the default 8192 bits —
    * the broadcast-small-side contract). */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 8192,
      kHashes: Int = 3): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    val lanes = keys
      .select(expr(halfSql(keyCol, 1)).as("__bf_h1"),
        expr(halfSql(keyCol, 16)).as("__bf_h2"))
      .select(explode(array((0 until kHashes).map(h =>
        expr(s"CAST((__bf_h1 + $h * __bf_h2) % $mBits AS INT)")): _*))
        .as("pos"))
      .select(expr("pos div 64").cast("int").as("lane"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("bit"))
      .groupBy("lane").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    lanes.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate for `keyCol` against a built filter: the
    * native single-digest expression. Codegen'd; the 128-long lane
    * array ships inside the plan, no broadcast machinery needed at
    * this size. */
  def mightContain(keyCol: String, lanes: Array[Long], mBits: Int = 8192,
      kHashes: Int = 3): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(col(keyCol)), lanes, mBits, kHashes))

  /** Pre-filter `df` to rows whose `keyCol` might be in the filter.
    * Keeps every true member; passes a ~(n/mBits)^k fraction of
    * non-members (removed by the exact join downstream). */
  def prefilter(df: DataFrame, keyCol: String, lanes: Array[Long],
      mBits: Int = 8192, kHashes: Int = 3): DataFrame =
    df.filter(mightContain(keyCol, lanes, mBits, kHashes))

  /** Per-GROUP filter build: one lane array per value of `groupCol`
    * — the per-file index shape ([[graft.io.Versioned.bloomIndex]]).
    * One distributed pass (distinct → explode-k → bit_or partials);
    * the collect is groups × nonzero lanes, bounded by the caller's
    * group count. */
  def buildGrouped(keys: DataFrame, groupCol: String, keyCol: String,
      mBits: Int, kHashes: Int): Map[String, Array[Long]] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    val rows = keys
      .select(col(groupCol).as("__g"),
        col(keyCol).cast("string").as("__k")).distinct()
      .select(col("__g"),
        expr(halfSql("__k", 1)).as("__bf_h1"),
        expr(halfSql("__k", 16)).as("__bf_h2"))
      .select(col("__g"), explode(array((0 until kHashes).map(h =>
        expr(s"CAST((__bf_h1 + $h * __bf_h2) % $mBits AS INT)")): _*))
        .as("pos"))
      .select(col("__g"), expr("pos div 64").cast("int").as("lane"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("bit"))
      .groupBy("__g", "lane").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (g, rs) =>
      val arr = new Array[Long](mBits / 64)
      rs.foreach(r => arr(r.getInt(1)) = r.getLong(2))
      g -> arr
    }
  }

  /** Driver-side membership test of one key against built lanes —
    * the same md5-halves double-hash algebra as [[build]] and
    * [[mightContain]], so a filter built distributed can gate
    * planning-time decisions (file pruning) on the driver. */
  def testKey(key: String, lanes: Array[Long], mBits: Int,
      kHashes: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md.map(b => f"$b%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    (0 until kHashes).forall { h =>
      val pos = ((h1 + h * h2) % mBits).toInt
      ((lanes(pos / 64) >> (pos % 64)) & 1L) == 1L
    }
  }
}
