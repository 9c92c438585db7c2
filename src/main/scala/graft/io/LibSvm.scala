package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * LibSVM source/sink -> `DataFrame(label: Double, features: Vector)`.
 *
 * Thin wrapper over Spark's built-in `libsvm` relation (the reference
 * reads this format for its secondary benchmark —
 * reference: test/InfoSelectorTest.scala:113, test/ErrorTest.scala:49
 * via MLUtils.loadLibSVMFile). The built-in source is already
 * distributed, splittable and schema-typed; wrapping it keeps the
 * engine's io surface uniform with [[KeelReader]].
 */
object LibSvm {

  /** Read a LibSVM file/directory. `numFeatures > 0` skips the extra
    * dimension-discovery pass (one fewer scan — always pass it when the
    * dimensionality is known). */
  def read(spark: SparkSession, path: String, numFeatures: Int = -1): DataFrame = {
    val reader = spark.read.format("libsvm")
    val withN =
      if (numFeatures > 0) reader.option("numFeatures", numFeatures.toString)
      else reader
    withN.load(path)
  }

  /** Write a `(label, features)` DataFrame as LibSVM text (1-based
    * indices, zeros omitted). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format("libsvm").save(path)
}
