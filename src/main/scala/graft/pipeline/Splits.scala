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
}
