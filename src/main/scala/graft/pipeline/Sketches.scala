package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic probabilistic sketches for corpus profiling at 100 TB
 * scale — additive surface beside the KMV bottom-k sketch (see
 * PipelineQueries.distinctKmv). Every hash is md5-derived, so the
 * sketches are reproducible across runs AND engines: the DuckDB oracle
 * recomputes the ESTIMATES themselves, not just error bounds.
 *
 * Scale shape: both sketches are one explode + one map-side-combinable
 * groupBy over fixed-size keyspaces (2^b registers / d*w counters) —
 * state is constant per group regardless of corpus size, the property
 * that lets a 1000-executor profile pass run in one shuffle of
 * sketch-sized partials.
 */
object Sketches {

  /**
   * HyperLogLog distinct-count estimate per group (Flajolet et al.
   * 2007), b register-index bits (m = 2^b registers, b in [4, 12]).
   * The register update max(rho) is idempotent, so no pre-distinct
   * pass is needed — the groupBy partial-aggregates map-side into at
   * most m rows per group per partition.
   *
   * Bit layout: the md5's first 15 hex digits (60 bits, fits a signed
   * long) split by SHIFT/MASK — top b bits index the register, the
   * NEXT 48 bits are the rank value for every b (the value width does
   * not move with b, so b = 8 is bit-identical to the historical
   * 2-hex/12-hex split the oracle pins). rho (leading-zero rank of
   * the 48-bit value) is computed as 49 - length(bin(v)) — pure
   * integer/string ops, bit-identical in both engines, avoiding
   * floor(log2(x)) whose libm rounding at exact powers of two differs
   * across engines.
   */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      b: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol, b), b)

  private def requireB(b: Int): Unit =
    require(b >= 4 && b <= 12,
      s"b = $b out of range: need 4 <= b <= 12 (16..4096 registers)")

  /** The sketch STATE: (g, bucket, rmax) register rows — at most m per
    * group. Mergeable: register tables from disjoint shards union +
    * re-max into the exact registers of the combined corpus (max is
    * associative/idempotent), which is what makes HLL the profile
    * sketch for incremental ingest — fold each shard's m-row state,
    * never re-scan the corpus. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      b: Int = 8): DataFrame = {
    requireB(b)
    // 60 hash bits; top b index the register, next 48 are the value
    val h60 = conv(substring(md5(col(valueCol)), 1, 15), 16, 10)
      .cast("long")
    df.select(col(groupCol).as("g"),
        shiftright(h60, 60 - b).as("bucket"),
        shiftright(h60, 12 - b).bitwiseAND(lit((1L << 48) - 1)).as("v"))
      .withColumn("rho",
        when(col("v") === 0, lit(49L))
          .otherwise(lit(49L) - length(bin(col("v")))))
      .groupBy("g", "bucket").agg(max("rho").as("rmax"))
  }

  /** Merge shard register tables (union + per-register max). */
  def hllMerge(regs: DataFrame*): DataFrame =
    regs.reduce(_.unionByName(_))
      .groupBy("g", "bucket").agg(max("rmax").as("rmax"))

  /** Fold register rows into the per-group estimate. */
  def hllEstimate(reg: DataFrame, b: Int = 8): DataFrame = {
    requireB(b)
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    reg.groupBy("g")
      .agg(sum(pow(lit(2.0), -col("rmax"))).as("zpresent"),
        count(lit(1)).as("present"))
      .select(col("g"),
        (lit(alpha * m * m)
          / (col("zpresent") + (lit(m) - col("present")))).as("e_raw"),
        (lit(m.toLong) - col("present")).as("zeros"))
      .select(col("g"),
        round(when(col("e_raw") <= 2.5 * m && col("zeros") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("e_raw"))).cast("long").as("est_distinct"))
  }

  /** The [[hllDistinct]] recurrence as oracle SQL over rows (g, val). */
  def hllDistinctSql(fromClause: String, gCol: String, vCol: String): String = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // pre-multiplied so DuckDB sees one DOUBLE literal, not a DECIMAL
    // product that overflows DECIMAL(18)
    val alphaM2 = alpha * m * m
    s"""hreg AS (
       |  SELECT $gCol AS g,
       |    CAST(('0x' || substr(md5($vCol), 1, 2)) AS BIGINT) AS bucket,
       |    CAST(('0x' || substr(md5($vCol), 3, 12)) AS BIGINT) AS v
       |  FROM $fromClause),
       |hrho AS (
       |  SELECT g, bucket,
       |    MAX(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS rmax
       |  FROM hreg GROUP BY 1, 2),
       |hagg AS (
       |  SELECT g, SUM(pow(2.0, -rmax)) AS zpresent, COUNT(*) AS present
       |  FROM hrho GROUP BY 1),
       |hest AS (
       |  SELECT g,
       |    $alphaM2 / (zpresent + ($m - present)) AS e_raw,
       |    $m - present AS zeros
       |  FROM hagg),
       |hll AS (
       |  SELECT g,
       |    CAST(ROUND(CASE WHEN e_raw <= ${2.5 * m} AND zeros > 0
       |      THEN $m * LN($m / CAST(zeros AS DOUBLE)) ELSE e_raw END)
       |      AS BIGINT) AS est_distinct
       |  FROM hest)""".stripMargin
  }

  /** Count-min sketch parameters shared with the oracle SQL. */
  val CmDepth: Int = 3
  val CmWidth: Int = 1024

  /** Count-min counter position for hash row i — salted md5, same 12
    * hex digits as [[Dedup.tokenId]]. */
  private def cmPos(i: Int, v: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"cm$i:"), v)), 1, 12), 16, 10)
      .cast("long") % CmWidth

  /**
   * Count-min sketch counter table over rows of `df`: (hrow, pos, c)
   * with d = [[CmDepth]] salted hash rows and w = [[CmWidth]] columns.
   * One explode to d rows per input row, then a map-side-combinable
   * groupBy on a keyspace of exactly d*w cells — the fixed-size
   * frequency summary that replaces a full token-count shuffle when
   * only heavy hitters matter.
   */
  def countMinTable(df: DataFrame, valueCol: String): DataFrame =
    // posexplode over a BARE long array: the element index IS the hash
    // row. The struct-array form (explode(array(struct(i, pos))))
    // measured 5x slower stacked above a tokenizing explode — nested
    // generators with struct construction fall off the fast path,
    // while a flat long array stays in codegen end to end.
    df.select(posexplode(
        array((0 until CmDepth).map(i => cmPos(i, col(valueCol))): _*))
        .as(Seq("hrow", "pos")))
      .groupBy("hrow", "pos")
      .agg(count(lit(1)).as("c"))

  /** [[countMinTable]] from a pre-aggregated (value, weight) frame —
    * identical counters (a cell's count is the weight sum of the
    * distinct values hashing into it), but the explode runs over
    * DISTINCT values instead of raw rows. Use when a (value, n)
    * aggregate already exists in the pipeline. */
  def countMinTableWeighted(df: DataFrame, valueCol: String,
      weightCol: String): DataFrame =
    df.select(col(weightCol).as("w"), posexplode(
        array((0 until CmDepth).map(i => cmPos(i, col(valueCol))): _*))
        .as(Seq("hrow", "pos")))
      .groupBy("hrow", "pos")
      .agg(sum("w").as("c"))

  /**
   * Point-estimate candidate frequencies from a count-min table:
   * est = min over hash rows of the candidate's counter. Always >= the
   * true count (collisions only inflate). The join side is the
   * candidate list — bounded by the caller — against a d*w-row table.
   */
  def countMinEstimate(counters: DataFrame, candidates: DataFrame,
      valueCol: String): DataFrame =
    candidates
      .select(col("*"), posexplode(
        array((0 until CmDepth).map(i => cmPos(i, col(valueCol))): _*))
        .as(Seq("hrow", "pos")))
      .join(counters, Seq("hrow", "pos"))
      .groupBy(candidates.columns.map(col): _*)
      .agg(min("c").as("est_n"))
}
