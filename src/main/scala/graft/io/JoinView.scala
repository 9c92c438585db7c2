package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incrementally-maintained JOIN view — `SELECT dim.<attr>, COUNT(*),
 * SUM(fact.cols…) FROM fact JOIN dim ON fact.<fk> = dim.<key> GROUP BY
 * dim.<attr>` kept fresh at delta cost over BOTH tables.
 *
 * The trick that makes it scale is the MAINTENANCE GRAIN: the
 * materialized state is a [[MatView]] over the FACT table grouped by
 * the JOIN KEY (the classic partial-aggregation-below-the-join
 * rewrite), and the dim attribute only enters at READ time:
 *
 *  - FACT deltas (append/upsert/delete/fk-migration) fold into the
 *    fk-grain view exactly like any MatView refresh — delta cost,
 *    exactly-once batch markers, never a fact re-scan;
 *  - DIM changes cost NOTHING to maintain: [[read]] joins the
 *    fk-grain view (≤ |distinct fk| rows — dimension-sized, orders of
 *    magnitude below the fact) against the dim's CURRENT resolved
 *    state and re-groups. A dim attribute update (a customer moving
 *    nations) is correct at the very next read with ZERO refresh work
 *    — where a dim-attribute-grain materialization would need to
 *    re-attribute every affected fact row.
 *
 * Join semantics are INNER: fact rows whose fk has no live dim row
 * drop from the served view (and reappear if the dim row is
 * reingested — nothing was lost, the fk-grain state still holds their
 * mass). The serve-side join is |distinct fk| × dim — at 100 TB both
 * sides are dimension-sized, so the join is trivially
 * broadcast-able/AQE-planned; the fact table is never read after the
 * fold.
 *
 * Same exactness contract as [[MatView]]: integral sum columns are
 * exact; both refresh paths and the concurrency/vacuum contracts are
 * inherited verbatim (the handle IS a MatView handle plus the dim
 * binding).
 */
object JoinView {

  final case class Handle(inner: MatView.Handle, dimPath: String,
      dimKeyCol: String, dimAttrCol: String)

  /** Create the view (dropping prior state) and fold the fact's
    * current head. `factKeyCol` = the fact table's resolve key,
    * `fkCol` = the join (foreign-key) column the state is grained by. */
  def init(spark: SparkSession, factPath: String, factKeyCol: String,
      fkCol: String, sumCols: Seq[String], dimPath: String,
      dimKeyCol: String, dimAttrCol: String, viewPath: String): Handle =
    Handle(
      MatView.init(spark, factPath, factKeyCol, fkCol, sumCols, viewPath),
      dimPath, dimKeyCol, dimAttrCol)

  /** Re-open a view created earlier (no refresh, no writes). */
  def handle(factPath: String, factKeyCol: String, fkCol: String,
      sumCols: Seq[String], dimPath: String, dimKeyCol: String,
      dimAttrCol: String, viewPath: String): Handle =
    Handle(MatView.Handle(viewPath, factPath, factKeyCol, fkCol, sumCols),
      dimPath, dimKeyCol, dimAttrCol)

  /** Fold fact versions (refreshed, head] into the fk-grain state —
    * dim changes need no refresh at all (see class doc). Returns the
    * fact version the view now reflects. Idempotent. */
  def refresh(spark: SparkSession, h: Handle): Int =
    MatView.refresh(spark, h.inner)

  /** The fact version the view reflects. */
  def refreshedVersion(spark: SparkSession, h: Handle): Int =
    MatView.refreshedVersion(spark, h.inner)

  /** The maintained state at the JOIN-KEY grain: (fk, n_rows,
    * sum_<c>…) — useful directly for fk-addressed serving. */
  def readByKey(spark: SparkSession, h: Handle): DataFrame =
    MatView.read(spark, h.inner)

  /** The served view at the DIM-ATTRIBUTE grain: the fk-grain state
    * joined to the dim's CURRENT resolved rows and re-grouped — always
    * reflects the dim's head with zero maintenance. */
  def read(spark: SparkSession, h: Handle): DataFrame = {
    val byFk = readByKey(spark, h)
    val dim = Versioned.current(spark, h.dimPath, h.dimKeyCol)
      .select(col(h.dimKeyCol), col(h.dimAttrCol))
    val fk = h.inner.groupCol
    val aggs = sum("n_rows").as("n_rows") +:
      h.inner.sumCols.map(c => sum(s"sum_$c").as(s"sum_$c"))
    byFk.join(dim, byFk(fk) === dim(h.dimKeyCol))
      .groupBy(col(h.dimAttrCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
