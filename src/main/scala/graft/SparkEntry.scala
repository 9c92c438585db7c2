package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{FrequencyDiscretizer, InfoThSelector}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Labeled byte-domain feature table derived from lineitem:
    * 4 discrete features + returnflag index as the class label.
    * Deterministic and SQL-expressible (mirrored by the DuckDB oracles). */
  private[graft] def lineitemFeatures(spark: SparkSession, dir: String): DataFrame =
    lineitemFeaturesOf(Tables.read(spark, dir, "lineitem"))

  private[graft] def lineitemFeaturesOf(li: DataFrame): DataFrame = {
    li.select(
      (when(col("l_returnflag") === "A", 0)
        .when(col("l_returnflag") === "N", 1)
        .otherwise(2)).cast("double").as("label"),
      col("l_quantity").cast("int").as("f0"),
      round(col("l_discount") * 100).cast("int").as("f1"),
      round(col("l_tax") * 100).cast("int").as("f2"),
      col("l_linenumber").cast("int").as("f3"))
  }

  /** Columnar vector assembly via `array_to_vector` — stays in
    * whole-stage codegen up to the vector UDT boundary (no Dataset.map
    * row deserialization pass). */
  private[graft] def assembled(spark: SparkSession, dir: String): DataFrame =
    assembledOf(lineitemFeatures(spark, dir))

  private[graft] def assembledOf(feats: DataFrame): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    feats.select(col("label"),
      array_to_vector(array(col("f0").cast("double"), col("f1").cast("double"),
        col("f2").cast("double"), col("f3").cast("double"))).as("features"))
  }

  /** Same as [[assembled]] plus the lineitem primary key, for queries
    * needing a deterministic per-row compare. */
  private[graft] def assembledWithKey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val li = Tables.read(spark, dir, "lineitem")
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      array_to_vector(array(
        col("l_quantity").cast("double"),
        round(col("l_discount") * 100).cast("double"),
        round(col("l_tax") * 100).cast("double"),
        col("l_linenumber").cast("double"))).as("features"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full greedy mRMR feature selection over lineitem-derived features,
    * returning the selection path (feature index, greedy score). */
  def entry(spark: SparkSession): DataFrame = {
    val df = assembled(spark, "/root/testdata/sf0.001")
    val model = new InfoThSelector()
      .setCriterion("mrmr").setNumTopFeatures(3).fit(df)
    import spark.implicits._
    model.selectionPath.toSeq.toDF("feature", "score")
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ PipelineQueries.all ++ StreamingQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ PipelineQueries.oracles ++ StreamingQueries.oracles
}

/** Manual end-to-end smoke drive (same shape as the driver's t1 check):
  * discretize -> select -> transform over real testdata parquet. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"== flagship entry (mRMR selection on $sf) ==")
    val sel = SparkEntry.entry(spark)
    sel.show()

    println("== discretizer + JMI selection + transform ==")
    val df = SparkEntry.assembled(spark, sf)
    val disc = new FrequencyDiscretizer().setNumBuckets(16)
      .setInputCol("features").setOutputCol("disc").setSeed(42).fit(df)
    val binned = disc.transform(df)
    val model = new InfoThSelector().setFeaturesCol("disc")
      .setCriterion("jmi").setNumTopFeatures(2).fit(binned)
    println(s"selected: ${model.selectedFeatures.mkString(", ")}")
    val out = model.transform(binned)
    out.select("label", "disc", "selectedFeatures").show(5, truncate = false)
    println(s"rows: ${out.count()}")
    spark.stop()
  }
}
