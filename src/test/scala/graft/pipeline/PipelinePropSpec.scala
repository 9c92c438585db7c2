package graft.pipeline

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the native text kernels against brute-force
  * Scala references — pure JVM (no SparkSession), so they run on every
  * corner ScalaCheck finds: empty/1-token docs, all-equal tokens,
  * unicode, adversarial merge pairs. */
class PipelinePropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val token: Gen[String] =
    Gen.oneOf(Gen.stringOfN(1, Gen.alphaLowerChar),
      Gen.stringOfN(2, Gen.alphaLowerChar),
      Gen.const("é中")) // non-ascii: codepoint handling
  private val doc: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, token))

  private def arr(toks: Seq[String]): GenericArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("RepetitionStats matches brute force on arbitrary token lists") {
    check(Prop.forAll(doc) { (toks: List[String]) =>
      val row = graft.functions.RepetitionStats.compute(arr(toks))
      val n = toks.length
      if (n == 0) {
        row.getDouble(0) == 0.0 && row.getDouble(1) == 0.0 &&
          row.getDouble(2) == 0.0
      } else {
        val dup = round6(1.0 - toks.distinct.size.toDouble / n)
        val top = round6(
          toks.groupBy(identity).values.map(_.size).max.toDouble / n)
        val grams = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
        val topBg =
          if (n < 2) 0.0
          else round6(
            grams.groupBy(identity).values.map(_.size).max.toDouble / (n - 1))
        row.getDouble(0) == dup && row.getDouble(1) == top &&
          row.getDouble(2) == topBg
      }
    })
  }

  test("CharPairs matches brute-force codepoint pairs") {
    val word: Gen[String] = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const('ü')))
        .map(_.mkString))
    check(Prop.forAll(word) { (w: String) =>
      val got = {
        val a = graft.functions.CharPairs.compute(UTF8String.fromString(w))
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      val cps = w.toSeq.map(_.toString) // test alphabet is BMP-only
      val want =
        if (cps.length < 2) Seq.empty
        else cps.zip(cps.drop(1)).map { case (a, b) => a + b }
      got == want
    })
  }

  test("MergePair kernel == driver-side segment for one merge") {
    val sym: Gen[String] = Gen.oneOf("a", "b", "ab", "ba", "c")
    val syms: Gen[List[String]] = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, sym))
    val pair: Gen[(String, String)] =
      for (x <- sym; y <- sym) yield (x, y)
    check(Prop.forAll(syms, pair) { (s: List[String], p: (String, String)) =>
      val (x, y) = p
      val a = graft.functions.MergePair.compute(arr(s),
        UTF8String.fromString(x), UTF8String.fromString(y),
        UTF8String.fromString(x + y))
      val got = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      // reference: single greedy left-to-right scan
      val want = {
        val out = List.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == x && s(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += s(i); i += 1 }
        }
        out.result()
      }
      got == want &&
        // merges never interleave: total length shrinks by matches found
        got.map(_.length).sum == s.map(_.length).sum
    })
  }

  test("AdjacentPairs matches zip-with-next") {
    val syms: Gen[List[String]] = Gen.choose(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.stringOfN(2, Gen.alphaLowerChar)))
    check(Prop.forAll(syms) { (s: List[String]) =>
      val a = graft.functions.AdjacentPairs.compute(arr(s))
      val got = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      val want =
        if (s.length < 2) Seq.empty
        else s.zip(s.drop(1)).map { case (x, y) => s"$x $y" }
      got == want
    })
  }

  test("NGramShingles matches sliding-join for every n, and n=2 == AdjacentPairs") {
    val gen: Gen[(List[String], Int)] = for {
      n <- Gen.choose(1, 5)
      len <- Gen.choose(0, 12)
      s <- Gen.listOfN(len, Gen.stringOfN(2, Gen.alphaLowerChar))
    } yield (s, n)
    check(Prop.forAll(gen) { case (s: List[String], n: Int) =>
      val a = graft.functions.NGramShingles.compute(arr(s), n)
      val got = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      val want =
        if (s.length < n) Seq.empty
        else s.sliding(n).map(_.mkString(" ")).toSeq
      val pairEquiv = n != 2 || {
        val p = graft.functions.AdjacentPairs.compute(arr(s))
        (0 until p.numElements()).map(i => p.getUTF8String(i).toString) == got
      }
      got == want && pairEquiv
    })
  }

  test("misra-gries survivor guarantee holds for random streams, " +
      "random partition splits and random merge orders") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val item: Gen[String] = Gen.frequency(
      (5, Gen.oneOf("h0", "h1", "h2")),          // heavy candidates
      (3, Gen.choose(0, 200).map("t" + _)),      // mid tail
      (1, Gen.choose(0, 5000).map("r" + _)))     // rare tail
    val gen = for {
      n <- Gen.choose(0, 2000)
      toks <- Gen.listOfN(n, item)
      k <- Gen.choose(2, 24)
      nParts <- Gen.choose(1, 5)
      cuts <- Gen.listOfN(n, Gen.choose(0, nParts - 1))
    } yield (toks, k, nParts, cuts)
    check(Prop.forAll(gen) { case (toks, k, nParts, cuts) =>
      val agg = graft.functions.MisraGriesAgg(
        BoundReference(0, StringType, nullable = true), k)
      // per-partition buffers, merged left-to-right over the random cut
      val bufs = Array.fill(nParts)(agg.createAggregationBuffer())
      toks.zip(cuts).foreach { case (t, p) =>
        agg.update(bufs(p), InternalRow(UTF8String.fromString(t)))
      }
      val merged = bufs.reduce(agg.merge)
      val out = {
        val a = agg.eval(merged)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map { i =>
          val r = a.getStruct(i, 2)
          r.getUTF8String(0).toString -> r.getLong(1)
        }.toMap
      }
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toDouble
      val thresh = n / (k + 1)
      out.size <= k &&
        exact.forall { case (t, c) =>
          c <= thresh ||
            (out.contains(t) && out(t) <= c && out(t) >= c - thresh)
        }
    })
    // and the WEIGHTED fold keeps the guarantee over shard summaries
    val shardGen = for {
      n <- Gen.choose(0, 1500)
      toks <- Gen.listOfN(n, item)
      k <- Gen.choose(2, 24)
      nShards <- Gen.choose(1, 4)
      cuts <- Gen.listOfN(n, Gen.choose(0, nShards - 1))
    } yield (toks, k, nShards, cuts)
    check(Prop.forAll(shardGen) { case (toks, k, nShards, cuts) =>
      val plain = graft.functions.MisraGriesAgg(
        BoundReference(0, StringType, nullable = true), k)
      val weighted = graft.functions.MisraGriesWeightedAgg(
        BoundReference(0, StringType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      def summarize(ts: Seq[String]) = {
        val b = plain.createAggregationBuffer()
        ts.foreach(t => plain.update(b, InternalRow(UTF8String.fromString(t))))
        b
      }
      val shards = (0 until nShards).map { p =>
        summarize(toks.zip(cuts).collect { case (t, c) if c == p => t })
      }
      val fold = weighted.createAggregationBuffer()
      shards.foreach { sh =>
        sh.forEach { (t, c) =>
          weighted.update(fold,
            InternalRow(UTF8String.fromString(t), java.lang.Long.valueOf(c)))
        }
      }
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toDouble
      // shard summaries each lose < n_p/(k+1); the fold loses < n/(k+1)
      // more — total slack strictly under 2n/(k+1)
      val slack = 2.0 * n / (k + 1)
      fold.size <= k &&
        exact.forall { case (t, c) =>
          c <= slack || (fold.containsKey(t) && fold.get(t) <= c)
        }
    })
  }
}
