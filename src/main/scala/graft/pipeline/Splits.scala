package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splitting for training pipelines: every row is
 * assigned to a named split by an md5-derived uniform draw on its id —
 * stable across runs, engines and cluster layouts (no RNG state, no
 * row order dependence), which is what makes train/val/test membership
 * reproducible and auditable at any scale. Pure per-row projection:
 * no shuffle, no state.
 */
object Splits {

  /**
   * Assign each row a split label. `cuts` are (name, cumulativeFraction)
   * with the last fraction = 1.0, e.g.
   * `Seq(("train", 0.8), ("val", 0.9), ("test", 1.0))`.
   * The draw is `tokenId(md5(id)) / P` — the same arithmetic the DuckDB
   * oracle reproduces exactly (see [[Dedup.tokenId]]).
   */
  def assign(df: DataFrame, idCol: String,
      cuts: Seq[(String, Double)]): DataFrame = {
    require(cuts.nonEmpty && math.abs(cuts.last._2 - 1.0) < 1e-12,
      "cuts must end at cumulative fraction 1.0")
    df.withColumn("split", splitColumn(col(idCol), cuts))
  }

  /** The split label as a column expression over an id column. */
  def splitColumn(id: Column, cuts: Seq[(String, Double)]): Column = {
    val u = Dedup.tokenId(id.cast("string")).cast("double") / Dedup.MinhashP
    val first = when(u < cuts.head._2, cuts.head._1)
    cuts.drop(1).dropRight(1)
      .foldLeft(first) { case (acc, (name, cut)) => acc.when(u < cut, name) }
      .otherwise(cuts.last._1)
  }

  /**
   * Deterministic stratified (per-stratum rate) sampling — the
   * language/source-balanced downsampling pass of a data-mixing
   * pipeline. A row is kept iff its md5-derived uniform draw (salted,
   * so samples are independent of split assignment) falls under its
   * stratum's rate. Pure per-row projection: reproducible across
   * runs/engines/layouts, no shuffle, no RNG state — at 100 TB this is
   * a filter pushed into the scan, not a sampling job.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "smp"): DataFrame =
    df.filter(sampleDraw(col(idCol), salt) < sampleRate(col(strataCol), rates, defaultRate))

  /** The salted uniform draw in [0, 1) for a row id. */
  def sampleDraw(id: Column, salt: String = "smp"): Column =
    Dedup.tokenId(concat(lit(salt + ":"), id.cast("string")))
      .cast("double") / Dedup.MinhashP

  /** The per-stratum keep rate as a column. */
  def sampleRate(stratum: Column, rates: Map[String, Double],
      defaultRate: Double): Column =
    rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (name, r)) => when(stratum === name, r).otherwise(acc)
    }

  /**
   * Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
   * each row draws key = -ln(u) / w from its salted md5-derived uniform
   * u in (0, 1]; the k smallest keys ARE the sample, distributed as
   * weighted draws without replacement. Deterministic — no RNG state,
   * so the sample is reproducible across runs and engines, and the
   * oracle can recompute the exact selection. Keys are rounded before
   * ranking (id tie-break) so float noise can't flip the cutoff.
   *
   * At 100 TB: the key is a per-row projection and the selection is a
   * global top-k (TakeOrderedAndProject — per-partition heaps, k rows
   * per partition to the driver), not a global sort.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsmp"): DataFrame = {
    val u = (Dedup.tokenId(concat(lit(salt + ":"), col(idCol).cast("string")))
      + lit(1L)).cast("double") / (Dedup.MinhashP.toDouble + 1.0)
    df.withColumn("es_key", round(-log(u) / col(weightCol), 9))
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /**
   * Deterministic training-export sharding — the "global shuffle then
   * shard" materialization step before a training run. Each row's
   * `shard` and within-shard order key `pos` derive from a salted
   * content-id hash ([[Dedup.tokenId]]): source-layout neighbors
   * scatter across shards, and every rerun — on any cluster size, any
   * input partitioning — produces the SAME shard membership and the
   * SAME within-shard order (ties on `pos` broken by id downstream).
   * Pure projection; the export write is [[exportLayout]].
   */
  def exportShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "exp"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = Dedup.tokenId(concat(lit(salt + ":"), col(idCol).cast("string")))
    df.withColumn("shard", (h % nShards).cast("int"))
      .withColumn("pos", h)
  }

  /**
   * The frame laid out for the export write: every shard's rows
   * CO-LOCATED in a single output partition (shards may share a
   * partition — hash placement — but never split), contiguous and in
   * deterministic `(pos, id)` order — what `write.partitionBy("shard")`
   * (or a per-shard tar/record writer) consumes to produce byte-stable
   * training shards. ONE hash shuffle on `shard` + a partition-local
   * sort; no global sort at any scale.
   */
  def exportLayout(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "exp"): DataFrame =
    exportShards(df, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"), col(idCol))

  /**
   * Per-shard export MANIFEST — what the training job verifies before
   * reading: row count, payload total (e.g. token or char budget per
   * shard), and an order-insensitive content fingerprint (exact
   * integer sum of per-row `tokenId(id:md5(content))` — a lost,
   * duplicated, or mutated row changes it; summing keeps it exact in
   * BIGINT up to ~2^32 rows per shard). One map-side-combined
   * aggregation over the corpus.
   */
  def exportManifest(df: DataFrame, idCol: String, contentCol: String,
      payloadCol: String, nShards: Int, salt: String = "exp"): DataFrame =
    exportShards(df, idCol, nShards, salt)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(payloadCol)).cast("long").as("payload"),
        sum(Dedup.tokenId(concat(col(idCol).cast("string"), lit(":"),
          md5(col(contentCol))))).cast("long").as("fp"))
}
