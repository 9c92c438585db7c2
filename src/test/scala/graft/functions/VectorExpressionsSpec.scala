package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("DotProduct matches the higher-order-function formulation bitwise") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Array.fill(64)(rng.nextFloat()), Array.fill(64)(rng.nextFloat())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.dotProduct($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "bitwise mismatch")
    }
  }

  test("DotProduct works on double arrays and in interpreted eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val e = DotProduct(
      Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType, false)),
      Literal.create(Seq(4.0, 5.0, 6.0), ArrayType(DoubleType, false)))
    assert(e.eval(InternalRow.empty) == 32.0)
  }

  test("null elements count as zero; null array yields null") {
    import spark.implicits._
    val df = spark.sql(
      "SELECT array(1.0D, NULL, 3.0D) AS a, array(2.0D, 9.0D, 4.0D) AS b")
    val v = df.select(VectorFunctions.dotProduct(col("a"), col("b"))).head
    assert(v.getDouble(0) == 1.0 * 2.0 + 0.0 + 3.0 * 4.0)
    val nf = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0D) AS b")
      .select(VectorFunctions.dotProduct(col("a"), col("b"))).head
    assert(nf.isNullAt(0))
  }

  test("norm equals sqrt of self dot product") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
    val n = df.select(VectorFunctions.l2Norm($"v")).head.getDouble(0)
    assert(math.abs(n - 5.0) < 1e-12)
  }

  test("nearestCentroids ranks by rounded cosine desc with cid-asc ties") {
    import spark.implicits._
    // centroids 7 and 9 are colinear with v (identical rounded cosine);
    // 3 is orthogonal. Tie must resolve to the smaller cid.
    val cb = Array(Array(1.0, 0.0), Array(2.0, 0.0), Array(0.0, 1.0))
    val norms = cb.map(c => math.sqrt(c.map(x => x * x).sum))
    val cids = Array(9L, 7L, 3L)
    val df = Seq(Tuple1(Array(5.0f, 0.0f))).toDF("v")
    val top = df.select(VectorFunctions.nearestCentroids(
      $"v", cb, norms, cids, 3)).head.getSeq[Long](0)
    assert(top == Seq(7L, 9L, 3L))
    // nProbe truncates in rank order
    val one = df.select(VectorFunctions.nearestCentroids(
      $"v", cb, norms, cids, 1)).head.getSeq[Long](0)
    assert(one == Seq(7L))
  }
}
