package graft.io

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Compact KEEL dataset reader -> `DataFrame(label: Double, features: Vector)`.
 *
 * Replaces the reference's 8.3k-line vendored JavaCC parser with the
 * surface actually used by its driver
 * (reference: test/KeelParser.scala:13-59, test/InfoSelectorTest.scala:107-111):
 * `@attribute` headers with NOMINAL value lists / INTEGER / REAL ranges
 * (keel/Dataset/Attribute.java:57-68), nominals mapped to their
 * value-list index, comma-separated data rows, last attribute = label.
 */
object KeelReader {

  sealed trait AttrType
  final case class Nominal(values: Array[String]) extends AttrType {
    private val index: Map[String, Double] =
      values.iterator.zipWithIndex.map { case (v, i) => v -> i.toDouble }.toMap
    def apply(s: String): Double = index.getOrElse(s,
      throw new IllegalArgumentException(s"Unknown nominal value: $s"))
  }
  /** Numeric attribute, optionally bounded by an explicit KEEL range
    * (`integer [0, 255]` / `real [0.0, 1.0]` — reference:
    * keel/Dataset/Attribute.java:57-68 stores min/max the same way).
    * Out-of-range values fail loudly at parse time. */
  final case class Numeric(min: Double = Double.NegativeInfinity,
      max: Double = Double.PositiveInfinity) extends AttrType

  final case class Attr(name: String, tpe: AttrType)

  private val attrRe =
    """(?i)@attribute\s+(\S+?)\s*(\{.*\}|integer.*|real.*|numeric.*)?\s*$""".r
  private val rangeRe = """\[\s*([^,\]]+)\s*,\s*([^\]]+)\s*\]""".r

  /** Parse one `@attribute` line: nominal `{a, b, c}`, or numeric with
    * an optional `[min, max]` range. */
  private[io] def parseAttribute(line: String): Attr = {
    val body = line.trim
    attrRe.findFirstMatchIn(body) match {
      case Some(m) =>
        val name = m.group(1)
        val rest = Option(m.group(2)).getOrElse("").trim
        if (rest.startsWith("{")) {
          val vals = rest.stripPrefix("{").stripSuffix("}")
            .split(",").map(_.trim).filter(_.nonEmpty)
          Attr(name, Nominal(vals))
        } else {
          val tpe = rangeRe.findFirstMatchIn(rest) match {
            case Some(r) => Numeric(r.group(1).trim.toDouble,
              r.group(2).trim.toDouble)
            case None => Numeric()
          }
          Attr(name, tpe)
        }
      case None =>
        throw new IllegalArgumentException(s"Bad @attribute line: $line")
    }
  }

  /** Parse the header lines of a KEEL file into the attribute list. */
  private[io] def parseHeader(lines: Seq[String]): Array[Attr] =
    lines.filter(_.trim.toLowerCase.startsWith("@attribute"))
      .map(parseAttribute).toArray

  /** KEEL missing-value token (reference: the vendored parser accepts
    * `?` / `<null>` in data rows). */
  private def isMissing(s: String): Boolean = s == "?" || s == "<null>"

  /**
   * Read a KEEL data file. Header (`@...`) and `separation` lines are
   * dropped from the scan exactly like the reference driver
   * (reference: test/InfoSelectorTest.scala:110). The last attribute is
   * the class label (reference: test/KeelParser.scala:55-57).
   *
   * `missingValue`: substitution for `?` / `<null>` cells (KEEL's
   * missing markers). Defaults to NaN so missingness stays visible —
   * byte-domain validation downstream will reject it loudly unless the
   * caller substitutes a real value (e.g. 0.0) or filters first.
   * Explicit `[min, max]` ranges on numeric attributes are enforced.
   */
  def read(spark: SparkSession, path: String,
      missingValue: Double = Double.NaN): DataFrame = {
    import spark.implicits._
    val raw = spark.read.textFile(path)
    // KEEL headers are tiny; collect only the @-lines to the driver.
    val headerLines = raw.filter(_.trim.startsWith("@")).collect().toSeq
    val attrs = parseHeader(headerLines)
    require(attrs.nonEmpty, s"No @attribute lines found in $path")
    val nf = attrs.length - 1
    val bAttrs = spark.sparkContext.broadcast(attrs)
    raw.filter { l =>
      val t = l.trim
      t.nonEmpty && !t.startsWith("@") && !t.startsWith("separation")
    }.map { line =>
      val parts = line.split(",").map(_.trim)
      val as = bAttrs.value
      require(parts.length == as.length,
        s"Row has ${parts.length} fields, expected ${as.length}: $line")
      def parse(i: Int): Double =
        if (isMissing(parts(i))) missingValue
        else as(i).tpe match {
          case n: Nominal => n(parts(i))
          case Numeric(min, max) =>
            val v = parts(i).toDouble
            require(v >= min && v <= max,
              s"${as(i).name}=$v outside declared range [$min, $max]")
            v
        }
      val features = Array.tabulate(nf)(parse)
      (parse(nf), Vectors.dense(features))
    }.toDF("label", "features")
  }
}
