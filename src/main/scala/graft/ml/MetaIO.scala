package graft.ml

import org.apache.hadoop.fs.Path

import org.apache.spark.ml.param.Params

import org.apache.spark.sql.SparkSession

/**
 * Minimal model-metadata persistence built only on public Spark API
 * (Spark's own `DefaultParamsWriter`/`Reader` are `private[ml]`).
 * Stores uid + explicitly-set simple params as a 1-row JSON dataset.
 */
private[graft] object MetaIO {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def save(instance: Params, uid: String, path: String,
      spark: SparkSession): Unit = {
    val kv = instance.params.flatMap { p =>
      instance.get(p).map { v =>
        val s = v match {
          case s: String => "\"" + esc(s) + "\""
          case other => other.toString
        }
        "\"" + esc(p.name) + "\":" + s
      }
    }.mkString(",")
    val json = s"""{"uid":"${esc(uid)}","params":{$kv}}"""
    import spark.implicits._
    spark.createDataset(Seq(json)).write.mode("overwrite")
      .text(new Path(path, "metadata").toString)
  }

  /** Returns (uid, paramName -> raw json literal). */
  def load(path: String, spark: SparkSession): (String, Map[String, String]) = {
    val json = spark.read.textFile(new Path(path, "metadata").toString)
      .head()
    val uid = """"uid":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val paramsBlock = json.indexOf("\"params\":{") match {
      case -1 => ""
      case i => json.substring(i + 10, json.lastIndexOf('}'))
    }
    val kvRe = """"((?:[^"\\]|\\.)+)":("(?:[^"\\]|\\.)*"|[^,}]+)""".r
    val m = kvRe.findAllMatchIn(paramsBlock).map { mm =>
      mm.group(1) -> mm.group(2)
    }.toMap
    (uid, m)
  }

  /** Apply loaded raw params back onto a Params instance. */
  def restore(instance: Params, raw: Map[String, String]): Unit =
    instance.params.foreach { p =>
      raw.get(p.name).foreach { lit =>
        val v: Any =
          if (lit.startsWith("\""))
            lit.substring(1, lit.length - 1)
              .replace("\\\"", "\"").replace("\\\\", "\\")
          else if (lit == "true" || lit == "false") lit.toBoolean
          else if (lit.matches("-?\\d+")) {
            val l = lit.toLong
            if (l >= Int.MinValue && l <= Int.MaxValue &&
              p.isInstanceOf[org.apache.spark.ml.param.IntParam]) l.toInt
            else l
          } else lit.toDouble
        try instance.set(p.asInstanceOf[org.apache.spark.ml.param.Param[Any]], v)
        catch { case _: Exception => () }
      }
    }
}
