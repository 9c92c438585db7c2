package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * All three per-document repetition metrics (duplicate-token fraction,
 * top-token fraction, top-bigram fraction) in ONE pass over the token
 * array, as a native Catalyst expression.
 *
 * The higher-order-function formulation (`transform(array_distinct(G),
 * g -> size(filter(G, x -> x = g)))`) is interpreted and re-evaluates
 * the captured array subtree on every lambda call — O(distinct × n)
 * with full array reconstruction each time; it was the measured
 * bottleneck of the 1M-doc text stress (268 s for the filter stack).
 * This kernel is one hash-counting scan per row (tokens + bigrams),
 * identical results, and the generated code is a constant-size call
 * (same design as [[NearestCentroids]]).
 *
 * Rounding contract shared with the DuckDB oracles: all fractions
 * round HALF_UP to 6 decimals exactly like Spark's `round(x, 6)`.
 * Bigram keys are the space-joined token pair — exactly the
 * `concat_ws(" ", t_i, t_{i+1})` the oracle counts (tokens come from a
 * split on space, so the separator is unambiguous).
 */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats expects array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "graft_repetition_stats"
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("dup_tok_frac", DoubleType, nullable = false),
    StructField("top_tok_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  private val Sep = UTF8String.fromString(" ")

  /** Spark `round(x, 6)` semantics for doubles (HALF_UP over the
    * shortest decimal repr). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One hash-counting pass over the token array; static so interpreted
    * eval and generated code share the identical hot loop. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0.0, 0.0, 0.0))
    val toks = new Array[UTF8String](n)
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var maxTok = 0
    var i = 0
    while (i < n) {
      val raw = arr.getUTF8String(i)
      val t = if (raw == null) UTF8String.EMPTY_UTF8 else raw
      toks(i) = t
      val c = counts.merge(t, 1, (a, b) => a + b)
      if (c > maxTok) maxTok = c
      i += 1
    }
    val distinct = counts.size()
    var topBg = 0.0
    if (n >= 2) {
      val bg = new java.util.HashMap[UTF8String, Integer](n * 2)
      var maxBg = 0
      i = 0
      while (i < n - 1) {
        val key = UTF8String.concat(toks(i), Sep, toks(i + 1))
        val c = bg.merge(key, 1, (a, b) => a + b)
        if (c > maxBg) maxBg = c
        i += 1
      }
      topBg = round6(maxBg.toDouble / (n - 1))
    }
    new GenericInternalRow(Array[Any](
      round6(1.0 - distinct.toDouble / n),
      round6(maxTok.toDouble / n),
      topBg))
  }
}

/**
 * Adjacent character pairs of a string as an array of 2-char strings —
 * the BPE round-1 candidate generator as ONE native expression (the
 * `transform(sequence(...), i -> substr ...)` formulation pays an
 * interpreted lambda frame per character across the corpus).
 * Codepoint-aware (UTF8String.substringSQL), matching both Spark's
 * `Column.substr` and DuckDB's `substring`. Words with < 2 chars
 * yield an empty array.
 */
case class CharPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_pairs expects string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    CharPairs.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharPairs.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)

  override def prettyName: String = "graft_char_pairs"
}

object CharPairs {
  def compute(w: UTF8String): ArrayData = {
    val n = w.numChars()
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = w.substringSQL(i + 1, 2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * Adjacent symbol pairs of a symbol array as "x y" strings (the BPE
 * merge-candidate generator over partially-merged corpora). Arrays
 * with < 2 elements yield an empty array.
 */
case class AdjacentPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adjacent_pairs expects array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    AdjacentPairs.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AdjacentPairs.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)

  override def prettyName: String = "graft_adjacent_pairs"
}

object AdjacentPairs {
  private val Sep = UTF8String.fromString(" ")
  /** Null elements are treated as empty strings (the declared output
    * type is containsNull = false — matching RepetitionStats). */
  @inline private[functions] def at(arr: ArrayData, i: Int): UTF8String = {
    val s = arr.getUTF8String(i)
    if (s == null) UTF8String.EMPTY_UTF8 else s
  }
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.concat(at(arr, i), Sep, at(arr, i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * Unicode NFC canonicalization (java.text.Normalizer) — the
 * text-canonicalization pass a multilingual corpus needs before any
 * hashing/dedup: decomposed "e"+U+0301 and composed "é" must
 * fingerprint identically or every accent-bearing duplicate escapes
 * the md5 window. Fast path: already-normalized strings (the
 * overwhelming majority of real text) return the input UTF8String
 * with zero allocation via Normalizer.isNormalized.
 */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_nfc expects string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    NormalizeNfc.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NormalizeNfc.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize_nfc"
}

object NormalizeNfc {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/**
 * Overlapping word n-gram shingles of a token array as space-joined
 * strings — the generalized [[AdjacentPairs]] (n = 2), the dedup
 * family's shingle kernel (duplicate-passage mining, 3-gram Jaccard,
 * decontamination, span coverage). One linear scan, no per-element
 * lambda interpretation, constant generated-code size. Arrays with
 * < n elements yield an empty array; null elements read as empty
 * strings (containsNull = false output, matching AdjacentPairs).
 */
case class NGramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_shingles expects n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_shingles expects array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    NGramShingles.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NGramShingles.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_ngram_shingles"
}

object NGramShingles {
  private val Sep = UTF8String.fromString(" ")
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < 2 * n - 1) { parts(j) = Sep; j += 2 }
    var i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) { parts(2 * k) = AdjacentPairs.at(arr, i + k); k += 1 }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * One BPE merge (x, y) -> xy applied to a symbol array: greedy
 * left-to-right non-overlapping, as standard BPE does. One linear scan
 * per row (the HOF fold's per-element slice+concat rebuilds the
 * accumulator array O(len) times per word). The merge pair rides as
 * expression parameters, so generated code is constant-size.
 */
case class MergePair(child: Expression, x: String, y: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"merge_pair expects array<string>, got $other")
    }

  @transient private lazy val ux = UTF8String.fromString(x)
  @transient private lazy val uy = UTF8String.fromString(y)
  @transient private lazy val uxy = UTF8String.fromString(x + y)

  override protected def nullSafeEval(v: Any): Any =
    MergePair.compute(v.asInstanceOf[ArrayData], ux, uy, uxy)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bx = ctx.addReferenceObj("mx", ux, "org.apache.spark.unsafe.types.UTF8String")
    val by = ctx.addReferenceObj("my", uy, "org.apache.spark.unsafe.types.UTF8String")
    val bxy = ctx.addReferenceObj("mxy", uxy, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MergePair.compute($v, $bx, $by, $bxy);")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)

  override def prettyName: String = "graft_merge_pair"
}

object MergePair {
  def compute(arr: ArrayData, x: UTF8String, y: UTF8String,
      xy: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var o = 0
    var i = 0
    while (i < n) {
      // null elements normalize to empty (output declares no nulls)
      val s = AdjacentPairs.at(arr, i)
      if (i + 1 < n && x.equals(s) && y.equals(AdjacentPairs.at(arr, i + 1))) {
        out(o) = xy; o += 1; i += 2
      } else {
        out(o) = s; o += 1; i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], o)
        .asInstanceOf[Array[Any]])
  }
}

/**
 * Winnowing sketch of a document as a PURE PROJECTION: the distinct
 * selected fingerprint VALUES, each paired with the document's distinct-
 * value count — array<struct<fp, n>> ready to explode straight into the
 * near-dup inverted index.
 *
 * Algorithm identical to [[graft.pipeline.TextOps]]' windowed pipeline
 * (md5-derived 40-bit k-gram hash, leftmost-min over each window of w
 * via the packed hash*2^21+pos key, distinct): the per-position
 * explode + per-doc window + distinct + size-count of the declarative
 * formulation is ~12 shuffled rows PER CHARACTER of corpus; this kernel
 * does the whole sketch in one monotone-deque pass per row, so the
 * sketch stage shuffles NOTHING.
 */
case class WinnowPostings(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow expects k, w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_postings expects string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    WinnowPostings.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WinnowPostings.compute($v, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowPostings =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_postings"
}

object WinnowPostings {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 40-bit gram hash = first 10 hex chars (5 bytes) of md5, identical
    * to conv(substring(md5(gram), 1, 10), 16, 10). */
  private def hash40(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 32) | ((d(1) & 0xFFL) << 24) |
      ((d(2) & 0xFFL) << 16) | ((d(3) & 0xFFL) << 8) | (d(4) & 0xFFL)

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val np = nChars - k + 1
    val posBits = graft.pipeline.TextOps.WinnowPosBits
    if (np >= (1 << posBits))
      throw new IllegalArgumentException(
        s"winnow: doc too long for packed key: $np k-gram positions")
    val md = md5.get()
    // packed comb(pos) = hash40 * 2^21 + pos, 1-based positions; ASCII
    // fast path hashes byte slices, multi-byte text falls back to
    // char-correct substrings (matching Spark's substr semantics)
    val combs = new Array[Long](np + 1)
    if (text.numBytes() == nChars) {
      val bytes = text.getBytes
      var p = 1
      while (p <= np) {
        md.update(bytes, p - 1, k)
        combs(p) = (hash40(md.digest()) << posBits) | p.toLong
        p += 1
      }
    } else {
      val s = text.toString
      var p = 1
      while (p <= np) {
        md.update(s.substring(p - 1, p - 1 + k)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        combs(p) = (hash40(md.digest()) << posBits) | p.toLong
        p += 1
      }
    }
    // leftmost-min per window of w consecutive positions (monotone
    // deque; combs are pairwise distinct, so min is unambiguous and a
    // re-selected element is always consecutive -> dedupe by last)
    val nWin = math.max(np - w + 1, 1)
    val dq = new Array[Int](np + 1)
    var head = 0
    var tail = 0
    def push(r: Int): Unit = {
      while (tail > head && combs(dq(tail - 1)) > combs(r)) tail -= 1
      dq(tail) = r
      tail += 1
    }
    var r = 1
    while (r <= math.min(w, np)) { push(r); r += 1 }
    val selected = new Array[Long](nWin)
    var nSel = 0
    var p = 1
    while (p <= nWin) {
      if (p > 1) {
        if (dq(head) < p) head += 1
        if (p + w - 1 <= np) push(p + w - 1)
      }
      val m = combs(dq(head))
      if (nSel == 0 || selected(nSel - 1) != m) { selected(nSel) = m; nSel += 1 }
      p += 1
    }
    // distinct fingerprint VALUES (positions dropped) + their count
    val fps = new Array[Long](nSel)
    var i = 0
    while (i < nSel) { fps(i) = selected(i) >>> posBits; i += 1 }
    java.util.Arrays.sort(fps, 0, nSel)
    var nFp = 0
    i = 0
    while (i < nSel) {
      if (nFp == 0 || fps(nFp - 1) != fps(i)) { fps(nFp) = fps(i); nFp += 1 }
      i += 1
    }
    val out = new Array[Any](nFp)
    i = 0
    while (i < nFp) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](fps(i), nFp.toLong))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * All i < j pairs of an (id, n) posting list, id-sorted — the
 * partition-local pair generator of the winnow near-dup index. The
 * higher-order-function formulation (flatten of nested transforms with
 * slice) is evaluated interpreted with a lambda frame per element and
 * re-evaluates the array reference per step; this kernel is one tight
 * loop emitting d(d-1)/2 rows, bounded by the caller's df cap.
 */
case class PairCombos(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ida", LongType, nullable = false),
      StructField("na", LongType, nullable = false),
      StructField("idb", LongType, nullable = false),
      StructField("nb", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_combos expects array<struct<long, long>>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    PairCombos.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PairCombos.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)

  override def prettyName: String = "graft_pair_combos"
}

object PairCombos {
  def compute(arr: ArrayData): ArrayData = {
    val d = arr.numElements()
    val ids = new Array[Long](d)
    val ns = new Array[Long](d)
    var i = 0
    while (i < d) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      ns(i) = s.getLong(1)
      i += 1
    }
    // insertion sort by id (d is df-cap bounded, typically tiny)
    i = 1
    while (i < d) {
      val ki = ids(i); val kn = ns(i)
      var j = i - 1
      while (j >= 0 && ids(j) > ki) {
        ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1
      }
      ids(j + 1) = ki; ns(j + 1) = kn
      i += 1
    }
    val out = new Array[Any](d * (d - 1) / 2)
    var o = 0
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ids(i), ns(i), ids(j), ns(j)))
        o += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-level entry points for the native text expressions. */
object TextFunctions {

  /** All repetition metrics of a token array in one pass:
    * struct(dup_tok_frac, top_tok_frac, top_bigram_frac). */
  def repetitionStats(toks: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(toks)))

  /** Adjacent character pairs of a word as 2-char strings. */
  def charPairs(w: Column): Column =
    GraftSqlBridge.column(CharPairs(GraftSqlBridge.expression(w)))

  /** Adjacent symbol pairs of a symbol array as "x y" strings. */
  def adjacentPairs(syms: Column): Column =
    GraftSqlBridge.column(AdjacentPairs(GraftSqlBridge.expression(syms)))

  /** One greedy BPE merge (x, y) -> xy over a symbol array. */
  def mergePair(syms: Column, x: String, y: String): Column =
    GraftSqlBridge.column(MergePair(GraftSqlBridge.expression(syms), x, y))

  /** Overlapping word n-gram shingles of a token array. */
  def ngramShingles(toks: Column, n: Int): Column =
    GraftSqlBridge.column(NGramShingles(GraftSqlBridge.expression(toks), n))

  /** Unicode NFC canonicalization. */
  def normalizeNfc(text: Column): Column =
    GraftSqlBridge.column(NormalizeNfc(GraftSqlBridge.expression(text)))

  /** Winnowing sketch as array<struct<fp, n>> — one pass, no shuffle. */
  def winnowPostings(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowPostings(GraftSqlBridge.expression(text), k, w))

  /** All i < j pairs of an (id, n) posting list, id-sorted. */
  def pairCombos(docs: Column): Column =
    GraftSqlBridge.column(PairCombos(GraftSqlBridge.expression(docs)))
}
