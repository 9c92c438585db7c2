package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the information-theory kernels and the
  * discretizer/sessionization invariants: the identities below hold for
  * ALL discrete distributions, so they probe corners (degenerate,
  * constant, skewed columns) that fixture tests never visit. */
class InfoTheoryPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val col: Gen[List[Int]] = for {
    n <- Gen.choose(1, 300)
    card <- Gen.choose(1, 6)
    xs <- Gen.listOfN(n, Gen.choose(0, card - 1))
  } yield xs

  test("MI is non-negative, symmetric, and bounded by min entropy") {
    check(Prop.forAll(col, col) { (a0: List[Int], b0: List[Int]) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val mi = InfoTheory.mutualInfo(Brute.hist2d(a, b), n)
      val miT = InfoTheory.mutualInfo(Brute.hist2d(b, a), n)
      mi >= -1e-12 &&
        math.abs(mi - miT) < 1e-9 &&
        mi <= math.min(Brute.entropy(a), Brute.entropy(b)) + 1e-9
    })
  }

  test("CMI chain rule holds for all distributions") {
    check(Prop.forAll(col, col, col) {
      (a0: List[Int], b0: List[Int], c0: List[Int]) =>
        val n = math.min(a0.length, math.min(b0.length, c0.length))
        val a = a0.take(n); val b = b0.take(n); val c = c0.take(n)
        // I(X;Y,Z) = I(X;Z) + I(X;Y|Z)
        val yz = b.zip(c).map { case (y, z) => y * 8 + z }
        val lhs = Brute.mi(a, yz)
        val ixz = InfoTheory.mutualInfo(Brute.hist2d(a, c), n)
        val (_, ixy_z) = InfoTheory.miAndCmi(Brute.hist3d(a, b, c), n)
        math.abs(lhs - (ixz + ixy_z)) < 1e-9
    })
  }

  test("entropy is within [0, log2(card)] and zero iff constant") {
    check(Prop.forAll(col) { (a: List[Int]) =>
      val h = Brute.entropy(a)
      h >= -1e-12 &&
        h <= InfoTheory.log2(a.distinct.size.toDouble) + 1e-9 &&
        (a.distinct.size != 1 || math.abs(h) < 1e-12)
    })
  }

  test("session lengths partition the event count and respect the gap") {
    import graft.streaming.StreamingOps.Sessionize
    val tsGen = for {
      n <- Gen.choose(1, 100)
      ts <- Gen.listOfN(n, Gen.choose(0L, 10L * Sessionize.GapMicros))
    } yield ts
    check(Prop.forAll(tsGen) { (ts: List[Long]) =>
      val lens = Sessionize.sessionLengths(ts)
      val sorted = ts.sorted
      val splits = sorted.zip(sorted.drop(1))
        .count { case (a, b) => b - a > Sessionize.GapMicros }
      lens.sum == ts.length.toLong &&
        lens.forall(_ >= 1) &&
        lens.length == splits + 1
    })
  }

  test("bucketize maps every in-range value to a valid ordered bucket") {
    import graft.ml.FrequencyDiscretizer
    val splitsGen = for {
      mids <- Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))
    } yield (Double.NegativeInfinity +: mids.distinct.sorted :+
      Double.PositiveInfinity).toArray
    check(Prop.forAll(splitsGen, Gen.choose(-1000.0, 1000.0)) {
      (splits: Array[Double], v: Double) =>
        val b = FrequencyDiscretizer.binarySearchForBuckets(splits, v).toInt
        b >= 0 && b <= splits.length - 2 &&
          v >= splits(b) && (v < splits(b + 1) || v == splits.last)
    })
  }
}
