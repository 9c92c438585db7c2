package graft.core

import scala.collection.mutable

import org.apache.spark.HashPartitioner
import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Columnar (transposed) working set: the engine's core internal
 * representation, mirroring the reference's `ColumnarData`
 * (reference: InfoSelector.scala:73-75) re-expressed Spark-first.
 *
 * Layout: `RDD[(feature, (block, bytes))]` where `block` is the source
 * partition id and `bytes` holds that feature's values for the block's
 * instances in row order. The class label is just another column at
 * index `nFeatures` (the reference appends it the same way,
 * InfoSelector.scala:431). Hash-partitioned by feature so all blocks of
 * one feature are co-located (reference: partitionByRange,
 * InfoSelector.scala:436) — histogram partial aggregation then completes
 * within a single partition and the keyed merge is shuffle-free.
 *
 * Scale notes (100 TB design): the transpose moves each cell exactly
 * once, packed in per-feature byte blocks (shuffle volume = O(cells)
 * BYTES, not O(cells) records). Blocks carry their own id, so later
 * repartitioning can never break the x/y alignment invariant
 * (SURVEY §7 risk 1) — alignment is by block id, never partition
 * placement.
 */
final case class ColumnarData(
    data: RDD[(Int, (Int, Array[Byte]))],
    nInstances: Long,
    nFeatures: Int,
    cardinality: Array[Int]) {

  /** Index of the class-label column. */
  def labelIndex: Int = nFeatures

  /** Collect one feature's blocks (block id -> bytes). Used to build the
    * broadcast side of the histogram kernels (reference: the
    * `withBroadcastSet` y/z columns, InfoTheory.scala:481, :541-545). */
  def collectColumn(feature: Int): Map[Int, Array[Byte]] =
    data.filter(_._1 == feature).map { case (_, (b, v)) => (b, v) }
      .collect().toMap

  def unpersist(): Unit = data.unpersist(blocking = false)
}

object Columnar {

  /** Byte-domain validation (reference: requireByteValues,
    * InfoSelector.scala:404-416; README.md:22-23 "maximum of 256 distinct
    * values"). We use the unsigned domain [0, 255] — values are histogram
    * indices. */
  @inline def toByteChecked(v: Double): Byte = {
    if (v < 0.0 || v > 255.0 || v % 1 != 0.0) {
      throw new IllegalArgumentException(
        s"Info-Theoretic Framework requires integer values in range [0, 255], got $v")
    }
    v.toByte
  }

  @inline def idx(b: Byte): Int = b & 0xFF

  /**
   * Block-local transpose of a `(label, features)` DataFrame into
   * columnar byte blocks (reference semantics: InfoSelector.scala:421-438).
   *
   * Sparse vectors are densified per row (implicit zeros become byte 0) —
   * the reference's dedicated sparse selection path is unimplemented
   * anyway (`selectSparseFeatures` throws, InfoSelector.scala:378-386).
   */
  def fromLabeledDf(
      df: DataFrame,
      featuresCol: String = "features",
      labelCol: String = "label",
      numPartitions: Int = 0): ColumnarData = {

    val rows = df.select(labelCol, featuresCol).rdd
    val nf = df.select(featuresCol).head
      .getAs[Vector](0).size
    val nCols = nf + 1

    val transposed: RDD[(Int, (Int, Array[Byte]))] =
      rows.mapPartitionsWithIndex { (pid, it) =>
        val builders = Array.fill(nCols)(new mutable.ArrayBuilder.ofByte)
        it.foreach { row =>
          val vec = row.getAs[Vector](1)
          require(vec.size == nf,
            s"Inconsistent vector size: ${vec.size} != $nf")
          vec match {
            case dv: DenseVector =>
              val vals = dv.values
              var j = 0
              while (j < nf) { builders(j) += toByteChecked(vals(j)); j += 1 }
            case sv: SparseVector =>
              val dense = new Array[Byte](nf)
              val ids = sv.indices; val vals = sv.values
              var j = 0
              while (j < ids.length) {
                dense(ids(j)) = toByteChecked(vals(j)); j += 1
              }
              j = 0
              while (j < nf) { builders(j) += dense(j); j += 1 }
          }
          builders(nCols - 1) += toByteChecked(row.getDouble(0))
        }
        builders.iterator.zipWithIndex.collect {
          case (b, f) =>
            val arr = b.result()
            (f, (pid, arr))
        }.filter(_._2._2.nonEmpty)
      }

    val parts =
      if (numPartitions > 0) numPartitions
      else rows.getNumPartitions
    val partitioned = transposed
      .partitionBy(new HashPartitioner(parts))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Cardinality pre-pass: per-feature max+1 bounds histogram dims
    // (reference: InfoTheory.scala:415-419). One cheap scan; map-side
    // combine keeps shuffle at O(nFeatures) records.
    val cards = partitioned
      .mapValues { case (_, bytes) =>
        var m = 0
        var i = 0
        while (i < bytes.length) {
          val v = idx(bytes(i)); if (v > m) m = v; i += 1
        }
        m
      }
      .reduceByKey(math.max(_, _))
      .collect()
    val cardinality = new Array[Int](nCols)
    cards.foreach { case (f, m) => cardinality(f) = m + 1 }

    val nInstances = partitioned
      .filter(_._1 == nCols - 1)
      .map(_._2._2.length.toLong)
      .fold(0L)(_ + _)

    ColumnarData(partitioned, nInstances, nf, cardinality)
  }
}
