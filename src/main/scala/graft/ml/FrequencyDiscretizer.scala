package graft.ml

import scala.collection.mutable

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol, HasSeed}
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

trait FrequencyDiscretizerParams extends Params
    with HasInputCol with HasOutputCol with HasSeed {

  /** Number of equal-frequency buckets per feature
    * (reference: nBins param, FrequencyDiscretizer.scala:106-116). */
  final val numBuckets = new IntParam(this, "numBuckets",
    "number of buckets (>= 2)", ParamValidators.gtEq(2))
  def getNumBuckets: Int = $(numBuckets)

  setDefault(numBuckets -> 2, inputCol -> "features",
    outputCol -> "discFeatures", seed -> this.getClass.getName.hashCode.toLong)

  protected def validateAndTransformSchema(schema: StructType): StructType = {
    require(schema($(inputCol)).dataType == SQLDataTypes.VectorType,
      s"Column ${$(inputCol)} must be ${SQLDataTypes.VectorType}")
    require(!schema.fieldNames.contains($(outputCol)),
      s"Output column ${$(outputCol)} already exists")
    schema.add($(outputCol), SQLDataTypes.VectorType, nullable = false)
  }
}

/**
 * Equal-frequency (quantile) discretizer over a vector column.
 *
 * Reference-faithful re-expression of the reference discretizer
 * (reference: FrequencyDiscretizer.scala:157-296, itself an adaptation of
 * Spark 1.6's QuantileDiscretizer): Bernoulli-sample
 * max(numBuckets^2, 10000) rows, collect, per-feature sorted
 * value-count split search, +/-Inf sentinel normalization. The documented
 * fast path for users who don't need sample-exact parity is Spark's
 * built-in `QuantileDiscretizer` (Greenwald-Khanna sketch).
 *
 * Fit cost: one count + one sampled collect, independent of nInstances —
 * scales to arbitrary input size by construction.
 */
class FrequencyDiscretizer(override val uid: String)
    extends Estimator[FrequencyDiscretizerModel]
    with FrequencyDiscretizerParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("freqDiscretizer"))

  def setNumBuckets(v: Int): this.type = set(numBuckets, v)
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def fit(dataset: Dataset[_]): FrequencyDiscretizerModel = {
    transformSchema(dataset.schema, logging = true)
    val vecs = dataset.select(col($(inputCol))).toDF()
    // D1: Bernoulli sample + collect
    // (reference: getSampledInput, FrequencyDiscretizer.scala:172-179).
    val total = vecs.count()
    require(total > 0, "empty input")
    val requiredSamples = math.max($(numBuckets) * $(numBuckets), 10000)
    val fraction = math.min(requiredSamples.toDouble / total, 1.0)
    val sample = vecs.sample(withReplacement = false, fraction, $(seed))
      .collect().map(_.getAs[Vector](0))
    require(sample.nonEmpty, "sample is empty; increase input size")
    val nf = sample.head.size
    val splitsArray = Array.tabulate(nf) { j =>
      val colSample = sample.map(_(j))
      val candidates = FrequencyDiscretizer
        .findSplitCandidates(colSample, $(numBuckets) - 1)
      val splits = FrequencyDiscretizer.getSplits(candidates)
      FrequencyDiscretizer.checkSplits(splits)
      splits
    }
    copyValues(new FrequencyDiscretizerModel(uid, splitsArray)
      .setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): FrequencyDiscretizer = defaultCopy(extra)
}

object FrequencyDiscretizer extends DefaultParamsReadable[FrequencyDiscretizer] {

  /** D2: equal-frequency split search over one feature's sample
    * (reference: findSplitCandidates, FrequencyDiscretizer.scala:185-225 —
    * the Spark 1.6 stride-scan algorithm, kept verbatim in semantics). */
  private[graft] def findSplitCandidates(
      samples: Array[Double], numSplits: Int): Array[Double] = {
    val valueCountMap = mutable.Map.empty[Double, Int]
    samples.foreach { v => valueCountMap(v) = valueCountMap.getOrElse(v, 0) + 1 }
    val valueCounts = valueCountMap.toSeq.sortBy(_._1).toArray :+
      ((Double.MaxValue, 1))
    val possibleSplits = valueCounts.length
    if (possibleSplits <= numSplits) {
      // few distincts -> every value is a split
      // (reference: FrequencyDiscretizer.scala:196-198)
      valueCounts.dropRight(1).map(_._1)
    } else {
      val stride = samples.length.toDouble / (numSplits + 1)
      val splitsBuilder = mutable.ArrayBuilder.make[Double]
      var index = 1
      var currentCount = valueCounts(0)._2
      var targetCount = stride
      while (index < valueCounts.length) {
        val previousCount = currentCount
        currentCount += valueCounts(index)._2
        val previousGap = math.abs(previousCount - targetCount)
        val currentGap = math.abs(currentCount - targetCount)
        if (previousGap < currentGap) {
          splitsBuilder += valueCounts(index - 1)._1
          targetCount += stride
        }
        index += 1
      }
      splitsBuilder.result()
    }
  }

  /** D3: +/-Inf sentinel normalization; default [-Inf, 0, +Inf]
    * (reference: getSplits, FrequencyDiscretizer.scala:231-254). */
  private[graft] def getSplits(candidates: Array[Double]): Array[Double] = {
    val effective =
      if (candidates.isEmpty) candidates
      else {
        val dropHead = candidates.head == Double.NegativeInfinity
        val dropLast = candidates.last == Double.PositiveInfinity
        candidates.slice(if (dropHead) 1 else 0,
          candidates.length - (if (dropLast) 1 else 0))
      }
    if (effective.isEmpty)
      Array(Double.NegativeInfinity, 0.0, Double.PositiveInfinity)
    else
      Double.NegativeInfinity +: effective :+ Double.PositiveInfinity
  }

  /** D4: length >= 3, strictly increasing
    * (reference: checkAllSplits, FrequencyDiscretizer.scala:257-272). */
  private[graft] def checkSplits(splits: Array[Double]): Unit = {
    require(splits.length >= 3,
      s"Splits must have >= 3 entries, got ${splits.length}")
    var i = 0
    while (i < splits.length - 1) {
      require(splits(i) < splits(i + 1),
        s"Splits must be strictly increasing: ${splits.mkString(", ")}")
      i += 1
    }
  }

  /** D5: per-value bucket lookup (reference: binarySearchForBuckets,
    * FrequencyDiscretizer.scala:278-296; Bucketizer conventions). */
  private[graft] def binarySearchForBuckets(
      splits: Array[Double], value: Double): Double = {
    if (value == splits.last) {
      splits.length - 2
    } else {
      val idx = java.util.Arrays.binarySearch(splits, value)
      if (idx >= 0) idx.toDouble
      else {
        val insertPos = -idx - 1
        if (insertPos == 0 || insertPos == splits.length)
          throw new IllegalArgumentException(
            s"Value $value out of Bucketizer bounds [${splits.head}, ${splits.last}]")
        (insertPos - 1).toDouble
      }
    }
  }
}

/** Model: per-feature bucketize via binary search — narrow, no shuffle
  * (reference transform: FrequencyDiscretizer.scala:301-332). Splits map
  * 1:1 onto Spark `Bucketizer.splitsArray` conventions. */
class FrequencyDiscretizerModel(
    override val uid: String,
    val splitsArray: Array[Array[Double]])
    extends Model[FrequencyDiscretizerModel]
    with FrequencyDiscretizerParams with MLWritable {

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema, logging = true)
    val splits = splitsArray
    val bucketize = udf { v: Vector =>
      val out = new Array[Double](v.size)
      var j = 0
      while (j < v.size) {
        out(j) = FrequencyDiscretizer.binarySearchForBuckets(splits(j), v(j))
        j += 1
      }
      Vectors.dense(out)
    }
    dataset.withColumn($(outputCol), bucketize(col($(inputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): FrequencyDiscretizerModel = {
    val copied = new FrequencyDiscretizerModel(uid, splitsArray)
    copyValues(copied, extra).setParent(parent)
  }

  override def write: MLWriter = new FrequencyDiscretizerModel.Writer(this)
}

object FrequencyDiscretizerModel extends MLReadable[FrequencyDiscretizerModel] {

  private[FrequencyDiscretizerModel] class Writer(
      instance: FrequencyDiscretizerModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      MetaIO.save(instance, instance.uid, path, sparkSession)
      val data = instance.splitsArray.zipWithIndex.toSeq
        .map { case (s, i) => (i, s.toSeq) }
      sparkSession.createDataFrame(data).toDF("feature", "splits")
        .repartition(1).write
        .parquet(new org.apache.hadoop.fs.Path(path, "data").toString)
    }
  }

  private class Reader extends MLReader[FrequencyDiscretizerModel] {
    override def load(path: String): FrequencyDiscretizerModel = {
      val (uid, raw) = MetaIO.load(path, sparkSession)
      val data = sparkSession.read
        .parquet(new org.apache.hadoop.fs.Path(path, "data").toString)
        .select("feature", "splits").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
      val model = new FrequencyDiscretizerModel(uid, data)
      MetaIO.restore(model, raw)
      model
    }
  }

  override def read: MLReader[FrequencyDiscretizerModel] = new Reader
}
