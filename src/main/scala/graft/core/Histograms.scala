package graft.core

import scala.collection.mutable

import org.apache.spark.rdd.RDD

/** Dense 2-D contingency table for one feature: counts(x*ys + y). */
final case class Hist2D(xs: Int, ys: Int, counts: Array[Long]) {
  @inline def apply(x: Int, y: Int): Long = counts(x * ys + y)
  def add(other: Hist2D): Hist2D = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    this
  }
  def total: Long = { var s = 0L; var i = 0; while (i < counts.length) { s += counts(i); i += 1 }; s }
}

/** Dense 3-D contingency table for one feature: counts((z*xs + x)*ys + y). */
final case class Hist3D(xs: Int, ys: Int, zs: Int, counts: Array[Long]) {
  @inline def apply(x: Int, y: Int, z: Int): Long = counts((z * xs + x) * ys + y)
  def add(other: Hist3D): Hist3D = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    this
  }
}

/**
 * Distributed contingency-table builders over the columnar working set.
 *
 * Re-expression of the reference's histogram dataflows
 * (reference: computeHistograms InfoTheory.scala:474-521,
 * computeConditionalHistograms InfoTheory.scala:535-586): each partition
 * scans its feature blocks against the block-carried label column (and
 * at most one broadcast column) and accumulates tight primitive-array
 * matrices (the partial/combiner stage); the keyed merge then shuffles
 * only O(nFeatures x partitions) small matrices (<= xs*|Y|(*|Z|) longs
 * each) — independent of nInstances. Scan parallelism follows the
 * (feature, block) partitioning, so no task ever scans a whole feature
 * column, and no label column ever crosses the driver.
 *
 * Sparse blocks use implicit-zero patching (reference semantics:
 * InfoTheory.scala:274-310, :324-390): explicit entries count directly,
 * and the zero row of the table receives the label (or label x y)
 * frequency of the block minus that of the explicit rows.
 */
object Histograms {

  import Columnar.idx

  /**
   * 2-D contingency tables of every feature vs. the block-carried class
   * label. Excludes the label column itself
   * (reference filter at InfoTheory.scala:429-430).
   */
  def histogram2D(col: ColumnarData): RDD[(Int, Hist2D)] = {
    val ys = col.cardinality(col.labelIndex)
    val labelIdx = col.labelIndex
    val cards = col.data.sparkContext.broadcast(col.cardinality)
    col.data.mapPartitions { it =>
      val acc = new mutable.HashMap[Int, Hist2D]
      it.foreach { case ((f, _), blk) =>
        if (f != labelIdx) {
          val h = acc.getOrElseUpdate(f, {
            val xs = cards.value(f)
            Hist2D(xs, ys, new Array[Long](xs * ys))
          })
          accumulate2D(blk.x, blk.label, h.counts, ys)
        }
      }
      acc.iterator
    }.reduceByKey(_.add(_))
  }

  /** Fold one column block against a dense y column into counts(x*ys+y). */
  private def accumulate2D(xb: ColBlock, ycol: Array[Byte],
      m: Array[Long], ys: Int): Unit = xb match {
    case DenseBlock(bytes) =>
      var i = 0
      while (i < bytes.length) {
        m(idx(bytes(i)) * ys + idx(ycol(i))) += 1L
        i += 1
      }
    case SparseBlock(n, rows, vals) =>
      val yfreq = new Array[Long](ys)
      var i = 0
      while (i < n) { yfreq(idx(ycol(i))) += 1L; i += 1 }
      i = 0
      while (i < rows.length) {
        val y = idx(ycol(rows(i)))
        m(idx(vals(i)) * ys + y) += 1L
        yfreq(y) -= 1L
        i += 1
      }
      // remaining mass = implicit zeros, at x = 0
      var y = 0
      while (y < ys) { m(y) += yfreq(y); y += 1 }
  }

  /**
   * 3-D contingency tables of every feature x vs. column y (the newly
   * selected feature) and the block-carried class label as z, excluding
   * y and the label themselves (reference: FilterWitH3 application,
   * InfoTheory.scala:455-456).
   *
   * The y column is NEVER collected, broadcast or shuffled: block-major
   * co-location (see [[ColumnarData]]) guarantees each partition holds
   * the y blocks of exactly the blocks it scans, so every task reads y
   * partition-locally.
   *
   * The scan is single-pass and streaming: records arrive block-grouped
   * and feature-ordered within a block (the transpose emits features
   * 0..nf in order and the cached partition preserves it), so at most
   * the records PRECEDING a block's y record are stashed (references,
   * not copies) and replayed once y is densified; everything after y
   * streams straight through. Unlike a whole-partition toArray, a
   * spilled-and-reread partition never pins more than the pre-y prefix
   * of one block in task heap. Per-round cost at any scale: one cached
   * scan + the O(nFeatures x blocks) matrix merge — no O(nInstances)
   * term on any single node.
   */
  def histogram3D(col: ColumnarData, yFeat: Int): RDD[(Int, Hist3D)] = {
    val ys = col.cardinality(yFeat)
    val zs = col.cardinality(col.labelIndex)
    val labelIdx = col.labelIndex
    val cards = col.data.sparkContext.broadcast(col.cardinality)
    col.data.mapPartitions { it =>
      val acc = new mutable.HashMap[Int, Hist3D]
      def fold(f: Int, blk: LabeledBlock, ycol: Array[Byte]): Unit =
        if (f != yFeat && f != labelIdx) {
          val h = acc.getOrElseUpdate(f, {
            val xs = cards.value(f)
            Hist3D(xs, ys, zs, new Array[Long](xs * ys * zs))
          })
          accumulate3D(blk.x, ycol, blk.label, h.counts, h.xs, ys, zs)
        }
      var curBlock = -1
      var ycol: Array[Byte] = null
      val pending = new mutable.ArrayBuffer[(Int, LabeledBlock)]
      it.foreach { case ((f, block), blk) =>
        if (block != curBlock) {
          if (pending.nonEmpty) throw new IllegalStateException(
            s"block $curBlock lost co-location with feature $yFeat")
          curBlock = block
          ycol = null
        }
        if (f == yFeat) {
          ycol = Columnar.densify(blk.x)
          pending.foreach { case (pf, pblk) => fold(pf, pblk, ycol) }
          pending.clear()
        } else if (ycol != null) fold(f, blk, ycol)
        else pending += ((f, blk))
      }
      if (pending.nonEmpty) throw new IllegalStateException(
        s"block $curBlock lost co-location with feature $yFeat")
      acc.iterator
    }.reduceByKey(_.add(_))
  }

  /** Fold one column block against dense y and z columns into
    * counts((z*xs + x)*ys + y). */
  private def accumulate3D(xb: ColBlock, ycol: Array[Byte], zcol: Array[Byte],
      m: Array[Long], xs: Int, ys: Int, zs: Int): Unit = xb match {
    case DenseBlock(bytes) =>
      var i = 0
      while (i < bytes.length) {
        m((idx(zcol(i)) * xs + idx(bytes(i))) * ys + idx(ycol(i))) += 1L
        i += 1
      }
    case SparseBlock(n, rows, vals) =>
      val yzfreq = new Array[Long](ys * zs)
      var i = 0
      while (i < n) { yzfreq(idx(zcol(i)) * ys + idx(ycol(i))) += 1L; i += 1 }
      i = 0
      while (i < rows.length) {
        val r = rows(i)
        val y = idx(ycol(r)); val z = idx(zcol(r))
        m((z * xs + idx(vals(i))) * ys + y) += 1L
        yzfreq(z * ys + y) -= 1L
        i += 1
      }
      var z = 0
      while (z < zs) {
        var y = 0
        while (y < ys) { m((z * xs) * ys + y) += yzfreq(z * ys + y); y += 1 }
        z += 1
      }
  }

  /**
   * Per-feature value frequencies (including the label column) in ONE
   * distributed job: each partition folds its blocks into <= 256-slot
   * arrays, the keyed merge ships O(nFeatures x partitions) tiny arrays,
   * and only the <= 256-row-per-feature result reaches the driver
   * (reference: computeFrequency, InfoTheory.scala:230-235 — but
   * distributed instead of per-column collects).
   */
  def frequenciesByFeature(col: ColumnarData): Map[Int, Array[Long]] = {
    val cards = col.data.sparkContext.broadcast(col.cardinality)
    col.data.map { case ((f, _), blk) =>
      val out = new Array[Long](cards.value(f))
      blk.x match {
        case DenseBlock(bytes) =>
          var i = 0
          while (i < bytes.length) { out(idx(bytes(i))) += 1L; i += 1 }
        case SparseBlock(n, rows, vals) =>
          var i = 0
          while (i < vals.length) { out(idx(vals(i))) += 1L; i += 1 }
          out(0) += n - rows.length
      }
      (f, out)
    }.reduceByKey { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }.collect().toMap
  }

}
