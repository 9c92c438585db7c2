package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Minimal versioned table format over plain parquet — the
 * Delta/Iceberg-shaped surface (transactional append, time travel,
 * merge-on-read upsert, tombstone delete, checkpoint compaction)
 * without a new file format:
 *
 * - each commit is a directory `v=N` of parquet files, stamped with a
 *   `__v` column and a `__deleted` tombstone flag IN the data, so any
 *   engine that reads parquet (the DuckDB oracle included) can resolve
 *   versions with plain SQL — no manifest parser required;
 * - commit atomicity rides Spark's `_SUCCESS` marker: a version
 *   directory without it (a torn write) is invisible to every reader;
 * - reads are declarative: `asOf(V)` unions the visible version dirs
 *   <= V (mergeSchema, so later versions may add columns);
 *   `currentAsOf` resolves merge-on-read semantics with ONE
 *   key-partitioned window (latest `__v` per key, tombstones dropped)
 *   — the same single-shuffle shape as the dedup keeper;
 * - `compact` materializes the resolved state as a new version marked
 *   `_CHECKPOINT`; subsequent reads start from the newest checkpoint
 *   at or below their as-of version, so read cost tracks data size,
 *   not history length. History stays intact (time travel to any
 *   version still works).
 *
 * At 100 TB: appends are just parquet writes (no global coordination
 * beyond the version counter — a real deployment would CAS the version
 * directory creation against the metastore); the resolve window
 * shuffles once on the key and is exactly as skew-bound as the data's
 * true key skew; compaction bounds the number of live version dirs.
 */
object Versioned {

  val VersionCol = "__v"
  val DeletedCol = "__deleted"
  private val CheckpointMarker = "_CHECKPOINT"
  private val SuccessMarker = "_SUCCESS"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed (has _SUCCESS) version numbers, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new Path(s.getPath, SuccessMarker)))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .sorted
  }

  def latestVersion(spark: SparkSession, path: String): Int =
    versions(spark, path).lastOption.getOrElse(0)

  /** Committed checkpoint versions, ascending. */
  private def checkpoints(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark, path)
    versions(spark, path)
      .filter(v => f.exists(new Path(s"$path/v=$v", CheckpointMarker)))
  }

  /** Append `df` as the next version; returns the committed version.
    * Rows are stamped with `__v` and (absent) `__deleted=false`. */
  def append(df: DataFrame, path: String): Int =
    commit(df, path, checkpoint = false)

  /** Append tombstones for `keys` (a one-column frame named like
    * `keyCol`): merge-on-read delete. */
  def delete(keys: DataFrame, path: String): Int =
    commit(keys.withColumn(DeletedCol, lit(true)), path, checkpoint = false)

  /** Idempotent micro-batch commit — the `foreachBatch` streaming sink:
    * appends `df` as the next version UNLESS `batchId` is already
    * committed (a `_BATCH_<id>` marker in its version dir), so
    * Structured Streaming's batch re-delivery on restart cannot
    * duplicate rows. Returns the version holding the batch either way.
    * The marker lands right after the version's `_SUCCESS`; a crash in
    * that instant re-appends the batch — same at-least-once-marker
    * caveat as any marker-file sink (a metastore CAS closes it in a
    * real deployment). */
  def appendBatch(df: DataFrame, path: String, batchId: Long): Int = {
    val spark = df.sparkSession
    val marker = s"_BATCH_$batchId"
    val f = fs(spark, path)
    versions(spark, path)
      .find(v => f.exists(new Path(s"$path/v=$v", marker)))
      .getOrElse {
        val v = commit(df, path, checkpoint = false)
        f.create(new Path(s"$path/v=$v", marker)).close()
        v
      }
  }

  private def commit(df: DataFrame, path: String, checkpoint: Boolean): Int = {
    val spark = df.sparkSession
    val v = latestVersion(spark, path) + 1
    val stamped = (if (df.columns.contains(DeletedCol)) df
      else df.withColumn(DeletedCol, lit(false)))
      .withColumn(VersionCol, lit(v))
    val dir = s"$path/v=$v"
    // a torn previous attempt (directory without _SUCCESS) is invisible
    // to readers; reclaim its slot instead of failing the commit
    val f = fs(spark, path)
    val dirPath = new Path(dir)
    if (f.exists(dirPath) && !f.exists(new Path(dirPath, SuccessMarker)))
      f.delete(dirPath, true)
    stamped.write.mode("error").parquet(dir)
    if (checkpoint)
      fs(spark, path).create(new Path(dir, CheckpointMarker)).close()
    v
  }

  /** Raw union of committed versions in (from, to] — mergeSchema, so a
    * column added in a later version reads as NULL in earlier rows. */
  private def read(spark: SparkSession, path: String,
      from: Int, to: Int): DataFrame = {
    val vs = versions(spark, path).filter(v => v > from && v <= to)
    require(vs.nonEmpty, s"no committed versions in ($from, $to] at $path")
    spark.read.option("mergeSchema", "true")
      .parquet(vs.map(v => s"$path/v=$v"): _*)
  }

  /** Time travel: every committed row as of `version` (no key
    * resolution — the append-log view). */
  def asOf(spark: SparkSession, path: String, version: Int): DataFrame =
    read(spark, path, 0, version)

  /** Merge-on-read resolve as of `version`: the latest row per key at
    * or below it, tombstones dropped. Reads from the newest checkpoint
    * <= version when one exists (compaction bounds read cost). */
  def currentAsOf(spark: SparkSession, path: String, keyCol: String,
      version: Int): DataFrame = {
    val base = checkpoints(spark, path).filter(_ <= version).lastOption
      .map(_ - 1).getOrElse(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(VersionCol).desc)
    read(spark, path, base, version)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && !col(DeletedCol))
      .drop("__rk")
  }

  def current(spark: SparkSession, path: String, keyCol: String): DataFrame =
    currentAsOf(spark, path, keyCol, latestVersion(spark, path))

  /** Materialize the resolved state as a checkpoint version. History
    * is preserved (time travel to older versions still works); reads
    * at or past the checkpoint no longer touch older versions. */
  def compact(spark: SparkSession, path: String, keyCol: String): Int = {
    val resolved = current(spark, path, keyCol)
      .drop(VersionCol)
    commit(resolved, path, checkpoint = true)
  }

  /** CDC view (change-data-feed shape): per key, what happened between
    * the resolved states at `fromV` and `toV` — `insert` (key appears),
    * `delete` (key gone), `update` (any COMMON column differs,
    * null-safe; columns added by schema evolution after `fromV` can't
    * be compared and don't count). One full-outer join of two resolved
    * states — each a single window over its version range. */
  def changes(spark: SparkSession, path: String, keyCol: String,
      fromV: Int, toV: Int): DataFrame = {
    require(fromV < toV, s"changes: fromV $fromV must be < toV $toV")
    val a = currentAsOf(spark, path, keyCol, fromV)
      .drop(VersionCol, DeletedCol)
    val b = currentAsOf(spark, path, keyCol, toV)
      .drop(VersionCol, DeletedCol)
    val common = a.columns.intersect(b.columns).filterNot(_ == keyCol)
    val af = a.select(Seq(col(keyCol), lit(true).as("__ina")) ++
      common.map(c => col(c).as(s"__a_$c")): _*)
    val bf = b.select(Seq(col(keyCol), lit(true).as("__inb")) ++
      common.map(c => col(c).as(s"__b_$c")): _*)
    val differs =
      if (common.isEmpty) lit(false)
      else common.map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
        .reduce(_ || _)
    af.join(bf, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__ina").isNull, lit("insert"))
          .when(col("__inb").isNull, lit("delete"))
          .when(differs, lit("update"))
          .otherwise(lit("none")).as("change_type"))
      .filter(col("change_type") =!= "none")
  }

  /** Destroy the table (test/fixture reset). */
  def drop(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }
}
