package graft.core

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
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
 * scans its feature blocks against 1-2 broadcast columns and accumulates
 * tight primitive-array matrices (the partial/combiner stage); the keyed
 * merge then shuffles only O(nFeatures x partitions) small matrices
 * (<= xs*|Y|(*|Z|) longs each) — independent of nInstances. Scan
 * parallelism follows the (feature, block) partitioning, so no task ever
 * scans a whole feature column.
 *
 * The broadcast side is 1-2 byte columns (ni bytes each), block-chunked,
 * shipped via torrent broadcast.
 */
object Histograms {

  import Columnar.idx

  /**
   * 2-D contingency tables of every feature vs. one broadcast column
   * (typically the class label). Excludes `yFeat` itself
   * (reference filter at InfoTheory.scala:429-430).
   */
  def histogram2D(
      col: ColumnarData,
      yFeat: Int,
      yBlocks: Broadcast[Map[Int, Array[Byte]]]): RDD[(Int, Hist2D)] = {
    val ys = col.cardinality(yFeat)
    val cards = col.data.sparkContext.broadcast(col.cardinality)
    col.data.mapPartitions { it =>
      val acc = new mutable.HashMap[Int, Hist2D]
      val yb = yBlocks.value
      it.foreach { case ((f, block), bytes) =>
        if (f != yFeat) {
          val h = acc.getOrElseUpdate(f, {
            val xs = cards.value(f)
            Hist2D(xs, ys, new Array[Long](xs * ys))
          })
          val ycol = yb(block)
          val m = h.counts
          var i = 0
          while (i < bytes.length) {
            m(idx(bytes(i)) * ys + idx(ycol(i))) += 1L
            i += 1
          }
        }
      }
      acc.iterator
    }.reduceByKey(_.add(_))
  }

  /**
   * 3-D contingency tables of every feature x vs. broadcast columns y
   * (the newly selected feature) and z (the class), excluding y and z
   * themselves (reference: FilterWitH3 application, InfoTheory.scala:455-456).
   */
  def histogram3D(
      col: ColumnarData,
      yFeat: Int,
      zFeat: Int,
      yBlocks: Broadcast[Map[Int, Array[Byte]]],
      zBlocks: Broadcast[Map[Int, Array[Byte]]]): RDD[(Int, Hist3D)] = {
    val ys = col.cardinality(yFeat)
    val zs = col.cardinality(zFeat)
    val cards = col.data.sparkContext.broadcast(col.cardinality)
    col.data.mapPartitions { it =>
      val acc = new mutable.HashMap[Int, Hist3D]
      val yb = yBlocks.value
      val zb = zBlocks.value
      it.foreach { case ((f, block), bytes) =>
        if (f != yFeat && f != zFeat) {
          val h = acc.getOrElseUpdate(f, {
            val xs = cards.value(f)
            Hist3D(xs, ys, zs, new Array[Long](xs * ys * zs))
          })
          val ycol = yb(block)
          val zcol = zb(block)
          val m = h.counts
          val xs = h.xs
          var i = 0
          while (i < bytes.length) {
            m((idx(zcol(i)) * xs + idx(bytes(i))) * ys + idx(ycol(i))) += 1L
            i += 1
          }
        }
      }
      acc.iterator
    }.reduceByKey(_.add(_))
  }

  /** Value-frequency histogram of a single collected column
    * (reference: computeFrequency, InfoTheory.scala:230-235). */
  def frequencies(blocks: Map[Int, Array[Byte]], card: Int): Array[Long] = {
    val out = new Array[Long](card)
    blocks.valuesIterator.foreach { bytes =>
      var i = 0
      while (i < bytes.length) { out(idx(bytes(i))) += 1L; i += 1 }
    }
    out
  }
}
