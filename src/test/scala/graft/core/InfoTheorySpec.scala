package graft.core

import org.scalatest.funsuite.AnyFunSuite

object Brute {
  private val ln2 = math.log(2.0)

  def mi(x: Seq[Int], y: Seq[Int]): Double = {
    val n = x.size.toDouble
    val pxy = x.zip(y).groupBy(identity).view.mapValues(_.size / n).toMap
    val px = x.groupBy(identity).view.mapValues(_.size / n).toMap
    val py = y.groupBy(identity).view.mapValues(_.size / n).toMap
    pxy.map { case ((a, b), p) => p * math.log(p / (px(a) * py(b))) / ln2 }.sum
  }

  def cmi(x: Seq[Int], y: Seq[Int], z: Seq[Int]): Double = {
    val n = x.size.toDouble
    val pxyz = x.lazyZip(y).lazyZip(z).toList.groupBy(identity)
      .view.mapValues(_.size / n).toMap
    val pxz = x.zip(z).groupBy(identity).view.mapValues(_.size / n).toMap
    val pyz = y.zip(z).groupBy(identity).view.mapValues(_.size / n).toMap
    val pz = z.groupBy(identity).view.mapValues(_.size / n).toMap
    pxyz.map { case ((a, b, c), p) =>
      p * math.log(pz(c) * p / (pxz((a, c)) * pyz((b, c)))) / ln2
    }.sum
  }

  def entropy(x: Seq[Int]): Double = {
    val n = x.size.toDouble
    x.groupBy(identity).values.map { g =>
      val p = g.size / n; -p * math.log(p) / ln2
    }.sum
  }

  def hist2d(x: Seq[Int], y: Seq[Int]): Hist2D = {
    val xs = x.max + 1; val ys = y.max + 1
    val h = Hist2D(xs, ys, new Array[Long](xs * ys))
    x.zip(y).foreach { case (a, b) => h.counts(a * ys + b) += 1 }
    h
  }

  def hist3d(x: Seq[Int], y: Seq[Int], z: Seq[Int]): Hist3D = {
    val xs = x.max + 1; val ys = y.max + 1; val zs = z.max + 1
    val h = Hist3D(xs, ys, zs, new Array[Long](xs * ys * zs))
    x.lazyZip(y).lazyZip(z).foreach { (a, b, c) =>
      h.counts((c * xs + a) * ys + b) += 1
    }
    h
  }
}

class InfoTheorySpec extends AnyFunSuite {
  import Brute._

  val eps = 1e-9
  val rng = new scala.util.Random(42)
  val n = 500
  val xr = Seq.fill(n)(rng.nextInt(5))
  val yr = Seq.fill(n)(rng.nextInt(3))
  val zr = Seq.fill(n)(rng.nextInt(4))

  private def approx(a: Double, b: Double, e: Double = 1e-9): Unit =
    assert(math.abs(a - b) <= e, s"$a != $b (+-$e)")

  test("MI matches brute force and is >= 0") {
    val v = InfoTheory.mutualInfo(hist2d(xr, yr), n)
    assert(v >= 0.0)
    approx(v, mi(xr, yr), eps)
  }

  test("MI(X,X) = H(X)") {
    approx(InfoTheory.mutualInfo(hist2d(xr, xr), n), entropy(xr))
  }

  test("MI symmetry") {
    approx(InfoTheory.mutualInfo(hist2d(xr, yr), n),
      InfoTheory.mutualInfo(hist2d(yr, xr), n))
  }

  test("MI of deterministic function is H(f(X))") {
    val fx = xr.map(_ % 2)
    approx(InfoTheory.mutualInfo(hist2d(xr, fx), n), entropy(fx))
  }

  test("miAndCmi matches brute force on correlated data") {
    val y2 = xr.zip(yr).map { case (a, b) => (a + b) % 3 }
    val (m, c) = InfoTheory.miAndCmi(hist3d(xr, y2, zr), n)
    approx(m, mi(xr, y2))
    approx(c, cmi(xr, y2, zr))
    assert(m >= 0 && c >= 0)
  }

  test("chain rule: I(X;Y,Z) = I(X;Z) + I(X;Y|Z)") {
    val yz = yr.zip(zr).map { case (b, c) => b * 4 + c }
    val ixyz = mi(xr, yz)
    val ixz = InfoTheory.mutualInfo(hist2d(xr, zr), n)
    val (_, ixy_z) = InfoTheory.miAndCmi(hist3d(xr, yr, zr), n)
    approx(ixyz, ixz + ixy_z, 1e-9)
  }

  test("entropy of uniform distribution is log2(k)") {
    val u = (0 until 256).flatMap(v => Seq.fill(4)(v))
    approx(Brute.entropy(u), 8.0)
    approx(InfoTheory.entropy(Array.fill(256)(4L), 1024), 8.0)
  }
}

class InfoThCriterionSpec extends AnyFunSuite {
  private def approx(a: Double, b: Double, e: Double = 1e-12): Unit =
    assert(math.abs(a - b) <= e, s"$a != $b")

  test("MIM score = relevance, unaffected by updates") {
    val c = InfoThCriterionFactory("mim").init(0.7)
    c.update(0.5, 0.1)
    approx(c.score, 0.7)
  }

  test("MIFS: rel - beta * sum(mi)") {
    val c = InfoThCriterionFactory("mifs", beta = 0.5).init(1.0)
    c.update(0.4, 0.0); c.update(0.2, 0.9)
    approx(c.score, 1.0 - 0.5 * 0.6)
  }

  test("JMI: rel - (sum(mi) - sum(cmi)) / k") {
    val c = InfoThCriterionFactory("jmi").init(1.0)
    c.update(0.4, 0.1); c.update(0.2, 0.3)
    approx(c.score, 1.0 - ((0.6 - 0.4) / 2))
  }

  test("mRMR: rel - sum(mi)/k") {
    val c = InfoThCriterionFactory("mrmr").init(1.0)
    c.update(0.4, 0.9); c.update(0.2, 0.9)
    approx(c.score, 1.0 - 0.3)
  }

  test("CMIM: rel - max(mi - cmi)") {
    val c = InfoThCriterionFactory("cmim").init(1.0)
    c.update(0.4, 0.1); c.update(0.2, 0.19)
    approx(c.score, 1.0 - 0.3)
  }

  test("ICAP: rel - sum(max(0, mi - cmi))") {
    val c = InfoThCriterionFactory("icap").init(1.0)
    c.update(0.4, 0.1); c.update(0.2, 0.9)
    approx(c.score, 1.0 - 0.3)
  }

  test("IF behaves like CMIM (reference: If extends Cmim)") {
    val a = InfoThCriterionFactory("if").init(1.0)
    val b = InfoThCriterionFactory("cmim").init(1.0)
    Seq((0.3, 0.1), (0.1, 0.5)).foreach { case (m, c) =>
      a.update(m, c); b.update(m, c)
    }
    approx(a.score, b.score)
  }

  test("unknown criterion throws") {
    intercept[IllegalArgumentException](InfoThCriterionFactory("nope"))
  }
}
