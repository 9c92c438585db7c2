package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Columnar
import graft.ml.InfoThSelector

/**
 * Scale-stress entrypoint (not driver-run): synthesizes an nRows x 32
 * byte-feature table DISTRIBUTED via `spark.range` (no driver
 * materialization anywhere) and runs the full selector core — transpose
 * + stats, then greedy mRMR — printing one JSON line of timings.
 *
 * Usage: runMain graft.Stress [nRows] [k]
 * Default 10M rows x 32 features + label ~ 330 MB columnar working set:
 * 16x the sf0.1 bench row count, exercising exactly the code paths the
 * 100 TB design arguments are about (block-major transpose, partition-
 * local histogram passes, O(nFeatures) driver traffic per round).
 */
object Stress {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val k = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nf = 32
    // deterministic byte features from the row id (pure codegen, no data
    // generation on the driver); label = 3-way hash class
    val feats = (0 until nf).map { j =>
      ((col("id") * (2654435761L + j) + j) % 64).cast("int").as(s"f$j")
    }
    val df = spark.range(nRows).repartition(cpus.toInt * 4)
      .select(feats :+ ((col("id") * 40503L) % 3).cast("int").as("label"): _*)

    val t0 = System.nanoTime()
    val colData = Columnar.fromIntColumns(df,
      (0 until nf).map(j => s"f$j"), "label")
    val tTranspose = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val selected = InfoThSelector.select(colData, "mrmr", k, 0.0)
    val tSelect = (System.nanoTime() - t1) / 1e9

    println(s"""{"metric":"stress","rows":$nRows,"features":$nf,"k":$k,""" +
      s""""transpose_stats_sec":$tTranspose,"greedy_mrmr_sec":$tSelect,""" +
      s""""selected":[${selected.map(_._1).mkString(",")}]}""")
    colData.unpersist()
    spark.stop()
  }
}
