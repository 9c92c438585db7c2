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
 * Layout: `RDD[((feature, block), bytes)]` where `block` is the source
 * partition id and `bytes` holds that feature's values for the block's
 * instances in row order. The class label is just another column at
 * index `nFeatures` (the reference appends it the same way,
 * InfoSelector.scala:431).
 *
 * Scale notes (100 TB design):
 * - The transpose moves each cell exactly once, packed in per-feature
 *   byte blocks: shuffle volume is O(cells) BYTES, not O(cells) records.
 * - Partitioning is by hash of (feature, block) — NOT by feature alone —
 *   so scan parallelism grows with data volume; a feature's partial
 *   histograms merge through a keyed reduce that shuffles only
 *   O(nFeatures x partitions) tiny count matrices (<= 6 KB each for a
 *   256x|Y| table). Partitioning by feature alone (the reference's
 *   partitionByRange(0), InfoSelector.scala:436) would make one task
 *   scan an entire feature column — a straggler at billions of rows.
 * - Blocks carry their own id, so repartitioning can never break the
 *   x/y alignment invariant (SURVEY §7 risk 1): alignment is by block
 *   id, never partition placement.
 */
final case class ColumnarData(
    data: RDD[((Int, Int), Array[Byte])],
    nInstances: Long,
    nFeatures: Int,
    cardinality: Array[Int]) {

  /** Index of the class-label column. */
  def labelIndex: Int = nFeatures

  /** Collect one feature's blocks (block id -> bytes). Used to build the
    * broadcast side of the histogram kernels (reference: the
    * `withBroadcastSet` y/z columns, InfoTheory.scala:481, :541-545). */
  def collectColumn(feature: Int): Map[Int, Array[Byte]] =
    data.filter(_._1._1 == feature).map { case ((_, b), v) => (b, v) }
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

    val rows0 = df.select(labelCol, featuresCol).rdd
    val rows = withParallelism(rows0, numPartitions)
    val nf = df.select(featuresCol).head
      .getAs[Vector](0).size
    val nCols = nf + 1

    val transposed: RDD[((Int, Int), Array[Byte])] =
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
          case (b, f) => ((f, pid), b.result())
        }.filter(_._2.nonEmpty)
      }
    finish(transposed, rows.getNumPartitions, nCols)
  }

  /**
   * Fast-path transpose from integer-valued columns (no ml.Vector
   * construction or UDT serialization on the hot path). `featureCols`
   * become features 0..n-1 in order; `labelCol` becomes column n.
   */
  def fromIntColumns(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      numPartitions: Int = 0): ColumnarData = {
    val nf = featureCols.length
    val nCols = nf + 1
    val rows0 = df.select((featureCols :+ labelCol).map(
      c => org.apache.spark.sql.functions.col(c).cast("int")): _*).rdd
    val rows = withParallelism(rows0, numPartitions)
    val transposed: RDD[((Int, Int), Array[Byte])] =
      rows.mapPartitionsWithIndex { (pid, it) =>
        val builders = Array.fill(nCols)(new mutable.ArrayBuilder.ofByte)
        it.foreach { row =>
          var j = 0
          while (j < nCols) {
            builders(j) += toByteChecked(row.getInt(j).toDouble); j += 1
          }
        }
        builders.iterator.zipWithIndex.collect {
          case (b, f) => ((f, pid), b.result())
        }.filter(_._2.nonEmpty)
      }
    finish(transposed, rows.getNumPartitions, nCols)
  }

  /** Spread narrow inputs (e.g. a single parquet row group) across the
    * cluster before the transpose; a wide input keeps its partitioning. */
  private def withParallelism[T: scala.reflect.ClassTag](
      rows: RDD[T], numPartitions: Int): RDD[T] = {
    val target =
      if (numPartitions > 0) numPartitions
      else rows.sparkContext.defaultParallelism
    if (rows.getNumPartitions < target) rows.repartition(target) else rows
  }

  /** Partition by (feature, block), persist, and run the single stats
    * pass: per-feature (max value, instance count) in one job
    * (cardinality pre-pass per reference InfoTheory.scala:415-419 fused
    * with the instance count). */
  private def finish(
      transposed: RDD[((Int, Int), Array[Byte])],
      parts: Int,
      nCols: Int): ColumnarData = {
    val partitioned = transposed
      .partitionBy(new HashPartitioner(parts))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val stats = partitioned
      .map { case ((f, _), bytes) =>
        var m = 0
        var i = 0
        while (i < bytes.length) {
          val v = idx(bytes(i)); if (v > m) m = v; i += 1
        }
        (f, (m, bytes.length.toLong))
      }
      .reduceByKey((a, b) => (math.max(a._1, b._1), a._2 + b._2))
      .collect()
    val cardinality = new Array[Int](nCols)
    var nInstances = 0L
    stats.foreach { case (f, (m, c)) =>
      cardinality(f) = m + 1
      if (f == nCols - 1) nInstances = c
    }
    ColumnarData(partitioned, nInstances, nCols - 1, cardinality)
  }
}
