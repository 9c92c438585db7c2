package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incrementally-maintained JOIN view — `SELECT dim.<attrs…>, COUNT(*),
 * SUM(fact.cols…), MIN/MAX(fact.cols…) FROM fact JOIN dim [JOIN dim2 …]
 * ON fact.<fk> = dim.<key> [AND dim.<fk2> = dim2.<key>] GROUP BY
 * dim.<attrs…>` kept fresh at delta cost over ALL tables.
 *
 * The trick that makes it scale is the MAINTENANCE GRAIN: the
 * materialized state is a [[MatView]] over the FACT table grouped by
 * the JOIN KEY (the classic partial-aggregation-below-the-join
 * rewrite), and the dim attributes only enter at READ time:
 *
 *  - FACT deltas (append/upsert/delete/fk-migration) fold into the
 *    fk-grain view exactly like any MatView refresh — delta cost,
 *    exactly-once batch markers, never a fact re-scan;
 *  - DIM changes cost NOTHING to maintain: [[read]] joins the
 *    fk-grain view (≤ |distinct fk| rows — dimension-sized, orders of
 *    magnitude below the fact) against each dim's CURRENT resolved
 *    state and re-groups. A dim attribute update (a customer moving
 *    nations) is correct at the very next read with ZERO refresh work
 *    — where a dim-attribute-grain materialization would need to
 *    re-attribute every affected fact row.
 *
 * SNOWFLAKE reads chain [[DimLink]] hops (fact→customer→nation): every
 * hop's join is fk-grain × dimension — all serve-side joins stay
 * dimension-sized no matter how deep the snowflake, because the fact's
 * mass was folded once at the fk grain. MIN/MAX columns re-aggregate
 * exactly at read (min of per-fk mins), with delete-correctness
 * inherited from [[MatView]]'s two-tier maintenance (append-only fast
 * path, scoped recompute otherwise).
 *
 * Join semantics are INNER: fact rows whose fk has no live dim row
 * drop from the served view (and reappear if the dim row is
 * reingested — nothing was lost, the fk-grain state still holds their
 * mass). The serve-side joins are |distinct fk| × dim — at 100 TB both
 * sides are dimension-sized, so each join is trivially
 * broadcast-able/AQE-planned; the fact table is never read after the
 * fold.
 *
 * Same exactness contract as [[MatView]]: integral sum columns are
 * exact; both refresh paths and the concurrency/vacuum contracts are
 * inherited verbatim (the handle IS a MatView handle plus the dim
 * bindings).
 */
object JoinView {

  /** One dimension hop of the serve-side join chain: `joinCol` — a
    * column of the level BELOW (the fk-grain state for the first hop,
    * the previous dim for later hops) — equi-joins this dim's
    * `dimKeyCol`; `carryCols` = this dim's columns surfaced outward
    * (grouping attributes, and/or the NEXT hop's `joinCol`). */
  final case class DimLink(dimPath: String, dimKeyCol: String,
      joinCol: String, carryCols: Seq[String])

  final case class Handle(inner: MatView.Handle, dims: Seq[DimLink],
      attrCols: Seq[String])

  /** Create the view (dropping prior state) and fold the fact's
    * current head. `factKeyCol` = the fact table's resolve key,
    * `fkCol` = the join (foreign-key) column the state is grained by,
    * `dims` = the serve-side join chain (first hop's `joinCol` is
    * normally `fkCol`), `attrCols` = the read's GROUP BY (drawn from
    * any hop's `carryCols`), `minMaxCols` = fact columns maintained as
    * min/max alongside the sums. */
  def init(spark: SparkSession, factPath: String, factKeyCol: String,
      fkCol: String, sumCols: Seq[String], dims: Seq[DimLink],
      attrCols: Seq[String], viewPath: String,
      minMaxCols: Seq[String] = Nil): Handle =
    Handle(
      MatView.init(spark, factPath, factKeyCol, fkCol, sumCols, viewPath,
        minMaxCols),
      dims, attrCols)

  /** Single-dim, single-attribute convenience (the original shape). */
  def init(spark: SparkSession, factPath: String, factKeyCol: String,
      fkCol: String, sumCols: Seq[String], dimPath: String,
      dimKeyCol: String, dimAttrCol: String, viewPath: String): Handle =
    init(spark, factPath, factKeyCol, fkCol, sumCols,
      Seq(DimLink(dimPath, dimKeyCol, fkCol, Seq(dimAttrCol))),
      Seq(dimAttrCol), viewPath)

  /** Re-open a view created earlier (no refresh, no writes). */
  def handle(factPath: String, factKeyCol: String, fkCol: String,
      sumCols: Seq[String], dims: Seq[DimLink], attrCols: Seq[String],
      viewPath: String, minMaxCols: Seq[String] = Nil): Handle =
    Handle(MatView.Handle(viewPath, factPath, factKeyCol, fkCol, sumCols,
      minMaxCols), dims, attrCols)

  /** Single-dim, single-attribute convenience (the original shape). */
  def handle(factPath: String, factKeyCol: String, fkCol: String,
      sumCols: Seq[String], dimPath: String, dimKeyCol: String,
      dimAttrCol: String, viewPath: String): Handle =
    handle(factPath, factKeyCol, fkCol, sumCols,
      Seq(DimLink(dimPath, dimKeyCol, fkCol, Seq(dimAttrCol))),
      Seq(dimAttrCol), viewPath)

  /** Fold fact versions (refreshed, head] into the fk-grain state —
    * dim changes need no refresh at all (see class doc). Returns the
    * fact version the view now reflects. Idempotent. */
  def refresh(spark: SparkSession, h: Handle): Int =
    MatView.refresh(spark, h.inner)

  /** The fact version the view reflects. */
  def refreshedVersion(spark: SparkSession, h: Handle): Int =
    MatView.refreshedVersion(spark, h.inner)

  /** The maintained state at the JOIN-KEY grain: (fk, n_rows,
    * sum_<c>…, min_<c>/max_<c>…) — useful directly for fk-addressed
    * serving. */
  def readByKey(spark: SparkSession, h: Handle): DataFrame =
    MatView.read(spark, h.inner)

  /** The served view at the DIM-ATTRIBUTE grain: the fk-grain state
    * joined through every [[DimLink]] hop against the dims' CURRENT
    * resolved rows and re-grouped by `attrCols` — always reflects the
    * dims' heads with zero maintenance. min/max re-aggregate exactly
    * (min over per-fk mins). */
  def read(spark: SparkSession, h: Handle): DataFrame = {
    val joined = h.dims.foldLeft(readByKey(spark, h)) { (cur, d) =>
      val dim = Versioned.current(spark, d.dimPath, d.dimKeyCol)
        .select((d.dimKeyCol +: d.carryCols).distinct.map(col): _*)
      cur.join(dim, cur(d.joinCol) === dim(d.dimKeyCol))
        .drop(dim(d.dimKeyCol))
    }
    val aggs = sum("n_rows").as("n_rows") +:
      (h.inner.sumCols.map(c => sum(s"sum_$c").as(s"sum_$c")) ++
        h.inner.minMaxCols.flatMap(c => Seq(
          min(s"min_$c").as(s"min_$c"), max(s"max_$c").as(s"max_$c"))))
    joined.groupBy(h.attrCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
