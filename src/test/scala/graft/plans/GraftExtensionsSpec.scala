package graft.plans

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("registered graft_dot_product is callable from SQL") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(v == 11.0)
  }

  test("extension class injects without error into a builder-style hook") {
    // exercise the SparkSessionExtensions path directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("wrong arity is rejected") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_dot_product(array(1.0D))").collect()
    }
  }

  test("text kernels are callable from SQL") {
    GraftExtensions.register(spark)
    val rs = spark.sql(
      "SELECT graft_repetition_stats(array('a','a','b')) AS s").head.getStruct(0)
    assert(rs.getDouble(1) == 0.666667) // top-token frac 2/3
    val pairs = spark.sql("SELECT graft_char_pairs('abc')").head
      .getSeq[String](0)
    assert(pairs == Seq("ab", "bc"))
    val adj = spark.sql("SELECT graft_adjacent_pairs(array('x','y','z'))")
      .head.getSeq[String](0)
    assert(adj == Seq("x y", "y z"))
    val merged = spark.sql(
      "SELECT graft_merge_pair(array('a','b','a'), 'a', 'b')").head
      .getSeq[String](0)
    assert(merged == Seq("ab", "a"))
    // non-literal (column-valued) merge pair rejected
    intercept[Exception] {
      spark.sql(
        "SELECT graft_merge_pair(array('a'), c, 'b') FROM (SELECT 'a' AS c)")
        .collect()
    }
    val sh = spark.sql("SELECT graft_ngram_shingles(array('a','b','c','d'), 3)")
      .head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    // non-literal n rejected
    intercept[Exception] {
      spark.sql(
        "SELECT graft_ngram_shingles(array('a'), n) FROM (SELECT 2 AS n)")
        .collect()
    }
    val nfc = spark.sql("SELECT graft_normalize_nfc('cafe\u0301')")
      .head.getString(0)
    assert(nfc == "caf\u00e9")
  }
}
