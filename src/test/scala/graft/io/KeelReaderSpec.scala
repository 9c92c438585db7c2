package graft.io

import java.nio.file.Files

import org.apache.spark.ml.linalg.Vector

import graft.SparkSpec

class KeelReaderSpec extends SparkSpec {

  test("reads KEEL file: nominals -> value index, last attr = label") {
    val content =
      """@relation tiny
        |@attribute a1 integer [0, 3]
        |@attribute a2 {red, green, blue}
        |@attribute a3 real [0.0, 2.0]
        |@attribute class {yes, no}
        |@inputs a1, a2, a3
        |@outputs class
        |@data
        |0,red,1.0,yes
        |2,blue,0.0,no
        |3,green,2.0,yes
        |""".stripMargin
    val f = Files.createTempFile("keel", ".dat")
    Files.writeString(f, content)
    val df = KeelReader.read(spark, f.toString)
    assert(df.columns.toSeq == Seq("label", "features"))
    val rows = df.collect().map(r =>
      (r.getDouble(0), r.getAs[Vector](1).toArray.toSeq))
    assert(rows.toSeq == Seq(
      (0.0, Seq(0.0, 0.0, 1.0)),
      (1.0, Seq(2.0, 2.0, 0.0)),
      (0.0, Seq(3.0, 1.0, 2.0))))
  }

  test("skips separation lines and unknown nominal throws") {
    val content =
      """@relation t
        |@attribute x {a, b}
        |@attribute class {p, n}
        |@data
        |separation
        |a,p
        |b,n
        |""".stripMargin
    val f = Files.createTempFile("keel2", ".dat")
    Files.writeString(f, content)
    val df = KeelReader.read(spark, f.toString)
    assert(df.count() == 2)
  }

  test("attribute parser handles types and explicit ranges") {
    assert(KeelReader.parseAttribute("@attribute x integer [0, 5]")
      == KeelReader.Attr("x", KeelReader.Numeric(0.0, 5.0)))
    assert(KeelReader.parseAttribute("@attribute y real [0.0, 1.0]")
      == KeelReader.Attr("y", KeelReader.Numeric(0.0, 1.0)))
    assert(KeelReader.parseAttribute("@attribute z numeric")
      == KeelReader.Attr("z", KeelReader.Numeric()))
    val n = KeelReader.parseAttribute("@attribute c {a, b, c}")
    assert(n.name == "c")
    assert(n.tpe.asInstanceOf[KeelReader.Nominal].values.toSeq == Seq("a", "b", "c"))
  }

  test("missing values (? / <null>) substitute; declared ranges enforce") {
    val content =
      """@relation m
        |@attribute x integer [0, 9]
        |@attribute y real [0.0, 1.0]
        |@attribute class {p, n}
        |@data
        |1,0.5,p
        |?,<null>,n
        |""".stripMargin
    val f = Files.createTempFile("keel3", ".dat")
    Files.writeString(f, content)
    // default NaN keeps missingness visible
    val nan = KeelReader.read(spark, f.toString).collect()
      .map(r => r.getAs[Vector](1).toArray.toSeq)
    assert(nan(1)(0).isNaN && nan(1)(1).isNaN)
    // caller-chosen substitution
    val zero = KeelReader.read(spark, f.toString, missingValue = 0.0)
      .collect().map(r => r.getAs[Vector](1).toArray.toSeq)
    assert(zero(1) == Seq(0.0, 0.0))
    // out-of-range value fails loudly
    val bad = Files.createTempFile("keel4", ".dat")
    Files.writeString(bad,
      """@relation b
        |@attribute x integer [0, 9]
        |@attribute class {p, n}
        |@data
        |11,p
        |""".stripMargin)
    intercept[org.apache.spark.SparkException] {
      KeelReader.read(spark, bad.toString).collect()
    }
  }
}
