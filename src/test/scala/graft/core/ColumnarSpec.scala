package graft.core

import org.apache.spark.ml.linalg.Vectors

import graft.SparkSpec

class ColumnarSpec extends SparkSpec {

  private def labeledDf(rows: Seq[(Double, Array[Double])]) = {
    val data = rows.map { case (l, v) => (l, Vectors.dense(v)) }
    spark.createDataFrame(data).toDF("label", "features")
  }

  test("transpose reconstructs columns and infers cardinality") {
    val rows = Seq(
      (0.0, Array(1.0, 4.0)),
      (1.0, Array(2.0, 5.0)),
      (0.0, Array(3.0, 4.0)),
      (1.0, Array(1.0, 6.0)))
    val col = Columnar.fromLabeledDf(labeledDf(rows).repartition(2))
    assert(col.nFeatures == 2)
    assert(col.nInstances == 4)
    assert(col.labelIndex == 2)
    // cardinality = max+1 per column
    assert(col.cardinality(0) == 4)  // max 3
    assert(col.cardinality(1) == 7)  // max 6
    assert(col.cardinality(2) == 2)  // labels {0,1}
    // multiset of values per feature is preserved
    val f0 = col.collectColumn(0).values.flatten.map(_.toInt).toSeq.sorted
    assert(f0 == Seq(1, 1, 2, 3))
    val lbl = col.collectColumn(2).values.flatten.map(_.toInt).toSeq.sorted
    assert(lbl == Seq(0, 0, 1, 1))
    // within-block alignment: rebuild rows from columns
    val blocks0 = col.collectColumn(0)
    val blocks1 = col.collectColumn(1)
    val blocksL = col.collectColumn(2)
    val rebuilt = blocks0.keys.toSeq.sorted.flatMap { b =>
      blocks0(b).toSeq.lazyZip(blocks1(b).toSeq).lazyZip(blocksL(b).toSeq)
        .map((a, c, l) => (l.toDouble, Array(a.toDouble, c.toDouble)))
    }
    assert(rebuilt.map(r => (r._1, r._2.mkString(","))).sorted.toSeq ==
      rows.map(r => (r._1, r._2.mkString(","))).sorted)
    col.unpersist()
  }

  test("sparse vectors densify with implicit zeros") {
    val data = Seq(
      (1.0, Vectors.sparse(4, Array(1, 3), Array(2.0, 7.0))),
      (0.0, Vectors.sparse(4, Array(0), Array(5.0))))
    val df = spark.createDataFrame(data).toDF("label", "features")
    val col = Columnar.fromLabeledDf(df)
    assert(col.collectColumn(0).values.flatten.map(_.toInt).toSeq.sorted == Seq(0, 5))
    assert(col.collectColumn(1).values.flatten.map(_.toInt).toSeq.sorted == Seq(0, 2))
    assert(col.collectColumn(2).values.flatten.map(_.toInt).toSeq.sorted == Seq(0, 0))
    assert(col.collectColumn(3).values.flatten.map(_.toInt).toSeq.sorted == Seq(0, 7))
    col.unpersist()
  }

  test("out-of-domain values are rejected") {
    intercept[org.apache.spark.SparkException] {
      Columnar.fromLabeledDf(labeledDf(Seq((0.0, Array(256.0))))).data.count()
    }
    intercept[org.apache.spark.SparkException] {
      Columnar.fromLabeledDf(labeledDf(Seq((0.0, Array(1.5))))).data.count()
    }
  }

  test("histogram2D/3D match brute-force counts") {
    val rng = new scala.util.Random(7)
    val n = 200
    val xs = Seq.fill(n)(rng.nextInt(6))
    val ys = Seq.fill(n)(rng.nextInt(4))
    val lbl = Seq.fill(n)(rng.nextInt(3))
    val rows = (0 until n).map { i =>
      (lbl(i).toDouble, Array(xs(i).toDouble, ys(i).toDouble))
    }
    val col = Columnar.fromLabeledDf(labeledDf(rows).repartition(3))
    val sc = spark.sparkContext
    val yB = sc.broadcast(col.collectColumn(col.labelIndex))

    val h2 = Histograms.histogram2D(col, col.labelIndex, yB).collect().toMap
    assert(h2.keySet == Set(0, 1))
    val expected2 = Brute.hist2d(xs, lbl)
    assert(h2(0).counts.toSeq == expected2.counts.toSeq)
    assert(h2(0).total == n)

    val zB = sc.broadcast(col.collectColumn(1))
    // x vs y=feature1, z=label
    val h3 = Histograms.histogram3D(col, 1, col.labelIndex, zB, yB)
      .collect().toMap
    assert(h3.keySet == Set(0))
    val expected3 = Brute.hist3d(xs, ys, lbl)
    assert(h3(0).counts.toSeq == expected3.counts.toSeq)

    // distributed MI equals brute MI
    val miDist = h2.map { case (f, h) => f -> InfoTheory.mutualInfo(h, n) }
    assert(math.abs(miDist(0) - Brute.mi(xs, lbl)) < 1e-9)
    val (m, c) = InfoTheory.miAndCmi(h3(0), n)
    assert(math.abs(m - Brute.mi(xs, ys)) < 1e-9)
    assert(math.abs(c - Brute.cmi(xs, ys, lbl)) < 1e-9)
    col.unpersist()
  }
}
