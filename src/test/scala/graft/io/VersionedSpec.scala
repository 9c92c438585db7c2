package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String = {
    val p = s"target/tmp/vspec-$tag"
    Versioned.drop(spark, p)
    p
  }

  test("append + asOf time travel + latestVersion") {
    val p = freshPath("tt")
    assert(Versioned.latestVersion(spark, p) == 0)
    assert(Versioned.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), p) == 1)
    assert(Versioned.append(Seq((3L, "c")).toDF("k", "s"), p) == 2)
    assert(Versioned.latestVersion(spark, p) == 2)
    assert(Versioned.asOf(spark, p, 1).count() == 2L)
    assert(Versioned.asOf(spark, p, 2).count() == 3L)
    // the log view carries the version stamp
    assert(Versioned.asOf(spark, p, 2)
      .filter(col(Versioned.VersionCol) === 2).count() == 1L)
  }

  test("merge-on-read: upsert wins, tombstone deletes, as-of resolves per version") {
    val p = freshPath("mor")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p) // upsert k=2
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)    // delete k=3
    def cur(v: Int) = Versioned.currentAsOf(spark, p, "k", v)
      .select("k", "x").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cur(1) == Map(1L -> 10, 2L -> 20, 3L -> 30))
    assert(cur(2) == Map(1L -> 10, 2L -> 99, 3L -> 30))
    assert(cur(3) == Map(1L -> 10, 2L -> 99))
  }

  test("schema evolution inside the log: later version adds a column") {
    val p = freshPath("evo")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 20, "fresh")).toDF("k", "x", "tag"), p)
    val cur = Versioned.current(spark, p, "k")
      .select(col("k"), col("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(cur == Map(1L -> None, 2L -> Some("fresh")))
  }

  test("compact: checkpointed read equals pre-compact state; time travel intact") {
    val p = freshPath("cp")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)
    val before = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val cpV = Versioned.compact(spark, p, "k")
    assert(cpV == 4)
    val after = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == before)
    // the checkpointed read touches ONLY the checkpoint version
    assert(Versioned.current(spark, p, "k")
      .select(Versioned.VersionCol).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    // history unbroken: as-of BELOW the checkpoint still resolves
    assert(Versioned.currentAsOf(spark, p, "k", 2)
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 10), (2L, 99), (3L, 30)))
  }

  test("changes: insert/update/delete between resolved versions, none suppressed") {
    val p = freshPath("cdc")
    Versioned.append(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "x"), p)
    Versioned.append(Seq((2L, 99)).toDF("k", "x"), p)  // update k=2
    Versioned.delete(Seq(Tuple1(3L)).toDF("k"), p)     // delete k=3
    Versioned.append(Seq((4L, 40)).toDF("k", "x"), p)  // insert k=4
    val got = Versioned.changes(spark, p, "k", 1, 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=1 unchanged -> absent
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    // re-inserting the same value is NOT a change between those versions
    assert(Versioned.changes(spark, p, "k", 2, 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(3L -> "delete", 4L -> "insert"))
  }

  test("appendBatch: re-delivered micro-batches commit exactly once") {
    val p = freshPath("batch")
    assert(Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p, 0L) == 1)
    // same batchId re-delivered (streaming restart): no new version
    assert(Versioned.appendBatch(Seq((1L, 10)).toDF("k", "x"), p, 0L) == 1)
    assert(Versioned.appendBatch(Seq((2L, 20)).toDF("k", "x"), p, 1L) == 2)
    assert(Versioned.latestVersion(spark, p) == 2)
    assert(Versioned.current(spark, p, "k").count() == 2L)
  }

  test("streaming ingest via foreachBatch lands every row exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val p = freshPath("stream")
    val stream = MemoryStream[(Long, Int)]
    val query = stream.toDS().toDF("k", "x").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Versioned.appendBatch(b, p, id); ()
      }
      .start()
    try {
      stream.addData((1L, 10), (2L, 20))
      query.processAllAvailable()
      stream.addData((3L, 30))
      query.processAllAvailable()
    } finally query.stop()
    val got = Versioned.current(spark, p, "k")
      .select("k", "x").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 10), (2L, 20), (3L, 30)))
    assert(Versioned.latestVersion(spark, p) == 2)
  }

  test("a torn write (no _SUCCESS) is invisible and its slot is reclaimed") {
    val p = freshPath("torn")
    Versioned.append(Seq((1L, 10)).toDF("k", "x"), p)
    // simulate a torn commit: directory exists, no _SUCCESS marker
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/v=2"))
    assert(Versioned.versions(spark, p) == Seq(1))
    assert(Versioned.latestVersion(spark, p) == 1)
    // the next commit reclaims v=2 and is fully visible
    assert(Versioned.append(Seq((2L, 20)).toDF("k", "x"), p) == 2)
    assert(Versioned.current(spark, p, "k").count() == 2L)
  }
}
