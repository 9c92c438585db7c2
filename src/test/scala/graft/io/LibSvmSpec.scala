package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.linalg.Vector

import graft.SparkSpec

class LibSvmSpec extends SparkSpec {

  test("reads libsvm text with implicit zeros (reference a1a shape)") {
    val dir = Files.createDirectories(
      Paths.get("target", "test-tmp", "libsvm-fixture"))
    val f = dir.resolve("sample.txt")
    Files.write(f, Seq(
      "1.0 1:2.0 3:5.0",
      "0.0 2:7.0",
      "1.0 1:1.0 2:1.0 3:1.0").mkString("\n").getBytes("UTF-8"))
    val df = LibSvm.read(spark, f.toString, 3)
    assert(df.columns.toSeq == Seq("label", "features"))
    val rows = df.collect().map(r =>
      (r.getDouble(0), r.getAs[Vector](1).toArray.toSeq))
      .sortBy(_._2.mkString(","))
    assert(rows.length == 3)
    val byLabel = df.collect()
      .map(r => (r.getDouble(0), r.getAs[Vector](1)))
    // implicit zeros materialize as 0.0 on access
    val zeroRow = byLabel.find(_._1 == 0.0).get._2
    assert(zeroRow.toArray.toSeq == Seq(0.0, 7.0, 0.0))
    assert(df.count() == 3)
  }

  test("write/read round-trip preserves label and features") {
    import spark.implicits._
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq(
      (1.0, Vectors.dense(3.0, 0.0, 2.0)),
      (0.0, Vectors.dense(0.0, 4.0, 0.0))).toDF("label", "features")
    val path = "target/test-tmp/libsvm-rt"
    LibSvm.write(df, path)
    val back = LibSvm.read(spark, path, 3).collect()
      .map(r => (r.getDouble(0), r.getAs[Vector](1).toArray.toSeq)).toSet
    assert(back == Set((1.0, Seq(3.0, 0.0, 2.0)), (0.0, Seq(0.0, 4.0, 0.0))))
  }
}
