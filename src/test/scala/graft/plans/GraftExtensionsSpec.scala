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
}
