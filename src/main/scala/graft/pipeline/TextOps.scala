package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * token counting, quality scoring, language identification, document
 * fingerprinting. All are pure `org.apache.spark.sql.functions` column
 * expressions — whole-stage-codegen'd, no UDFs, no shuffles; they scale
 * as a single narrow scan over the corpus.
 */
object TextOps {

  /** Whitespace tokenization (shared with the DuckDB oracle's
    * string_split semantics). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word count approximation: words plus extra units for
    * every 4 chars beyond the first 4 of each word (cheap, codegen'd).
    * Long-typed on both sides — DuckDB's list_sum widens to HUGEINT, so
    * the oracle casts back to BIGINT and we emit int64 here. */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, w) => acc + lit(1) + floor(greatest(length(w) - lit(1), lit(0)) / lit(4)).cast("int"))
      .cast("long")

  /** Ratio of tokens found in `words`, rounded to 6 decimals. */
  def hitRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    round(size(filter(toks, t => t.isInCollection(words)))
      .cast("double") / size(toks), 6)
  }

  /** English-ish stopword list used by the quality score. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Mean token length, rounded to 6 decimals. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    round(aggregate(toks, lit(0), (acc, w) => acc + length(w))
      .cast("double") / size(toks), 6)
  }

  /** Punctuation character ratio (over all chars). */
  def punctRatio(text: Column): Column =
    round((length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / length(text), 6)

  /**
   * Composite quality score in [0, 1]: rewards mid-length documents,
   * a natural stopword rate and low punctuation noise.
   * score = 0.4*min(1, n_tokens/50) + 0.4*(1 - min(1, |stop - 0.12|/0.5))
   *         + 0.2*(1 - min(1, punct*5))     (rounded to 6)
   */
  def qualityScore(text: Column): Column = {
    val nt = tokenCount(text).cast("double")
    val stop = size(filter(tokens(text), t => t.isInCollection(stopwords)))
      .cast("double") / size(tokens(text))
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / length(text)
    round(lit(0.4) * least(lit(1.0), nt / 50.0) +
      lit(0.4) * (lit(1.0) - least(lit(1.0), abs(stop - 0.12) / 0.5)) +
      lit(0.2) * (lit(1.0) - least(lit(1.0), punct * 5.0)), 6)
  }

  /** Per-language marker wordlists for the n-gram/stopword language-ID
    * heuristic. Deterministic and tiny; real deployments would swap in
    * per-language frequency tables — the plan shape is identical. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "table", "row", "order", "fast"),
    "de" -> Seq("der", "und", "vector", "hash", "batch", "key"),
    "es" -> Seq("el", "los", "slow", "agg", "merge", "value"),
    "fr" -> Seq("le", "et", "scan", "data", "query", "small"),
    "zh" -> Seq("zh", "join", "customer", "column", "stream", "window"))

  /** Predicted language = argmax marker-hit ratio, ties broken by list
    * order (en < de < es < fr < zh by declaration order). */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (l, ws) => (l, hitRatio(text, ws)) }
    // fold to (bestLang, bestScore); strictly-greater keeps earlier
    // declarations on ties
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
  }

  // ---- repetition metrics (Gopher-style filters) ----
  //
  // All three are PURE per-document expressions - a narrow scan with no
  // explode, no shuffle, no per-document state anywhere else: the shape
  // that holds at 100 TB because repetition is a per-row property. The
  // metrics compute in ONE hash-counting pass per row via the native
  // [[graft.functions.RepetitionStats]] Catalyst expression (the
  // higher-order-function formulation is interpreted and re-evaluates
  // captured subtrees per lambda call - the measured bottleneck of the
  // 1M-doc text stress). Equal stats subtrees inside one projection are
  // merged by codegen subexpression elimination, so stacking the three
  // metrics (or the composed filter) still costs one pass per row.

  /** All repetition metrics in one pass:
    * struct(dup_tok_frac, top_tok_frac, top_bigram_frac). */
  def repetitionStats(text: Column): Column =
    graft.functions.TextFunctions.repetitionStats(tokens(text))

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 - |distinct| / n, rounded to 6. */
  def dupTokenFrac(text: Column): Column =
    repetitionStats(text).getField("dup_tok_frac")

  /** Fraction of tokens taken by the single most frequent token. */
  def topTokenFrac(text: Column): Column =
    repetitionStats(text).getField("top_tok_frac")

  /** Fraction of bigram slots taken by the most frequent word bigram
    * (0.0 for sub-2-token docs). The fraction is tie-invariant, so no
    * argmax-over-strings determinism contract is needed. */
  def topBigramFrac(text: Column): Column =
    repetitionStats(text).getField("top_bigram_frac")

  /**
   * Composed document-quality filter rules, first-fail semantics:
   * (ruleName, failCondition) evaluated in order; a document's `reason`
   * is the first failing rule or "ok". Thresholds sit inside the
   * observed sf-corpus distributions so every rule actually fires.
   */
  def filterRules(text: Column): Seq[(String, Column)] = Seq(
    "too_short" -> (tokenCount(text) < 25),
    "repetitive_tokens" -> (dupTokenFrac(text) > 0.65),
    "dominant_bigram" -> (topBigramFrac(text) > 0.06),
    "low_stopword" -> (hitRatio(text, stopwords) < 0.01))

  /** First failing rule name, or "ok". */
  def filterReason(text: Column): Column = {
    val rules = filterRules(text)
    rules.tail.foldLeft(when(rules.head._2, rules.head._1)) {
      case (acc, (name, cond)) => acc.when(cond, name)
    }.otherwise("ok")
  }

  // ---- PII scrubbing ----
  //
  // Pattern-based redaction: pure regexp projections (codegen'd, narrow
  // scan). Patterns stay in the POSIX-compatible subset both Java regex
  // and the oracle's RE2 interpret identically.

  /** (name, pattern, replacement) redaction rules: emails and long
    * digit runs (phone-ish). */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
    ("number", "[0-9]{7,}", "<NUM>"))

  /** Count of matches of one pattern (via split length - 1: identical
    * accounting in both engines for non-overlapping matches). */
  def patternCount(text: Column, pattern: String): Column =
    (size(split(text, pattern, -1)) - 1).cast("long")

  /** Text with every rule's matches replaced by its placeholder,
    * rules applied in declaration order. */
  def redact(text: Column): Column =
    piiRules.foldLeft(text) { case (t, (_, p, r)) => regexp_replace(t, p, r) }

  /** Content fingerprint: md5 hex (matches DuckDB's md5()). */
  def fingerprint(text: Column): Column = md5(text)

  /** 64-bit rolling polynomial hash (Karp-Rabin style) of the raw text —
    * the fast non-cryptographic fingerprint; Scala-side (used by
    * streaming-ready components), verified against md5 grouping in tests. */
  def rollingHash(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** Modulus for the column-level rolling fingerprint (fits h*31 + c in
    * a long with no overflow). */
  val RollingMod: Long = 1000000007L

  /** Rolling polynomial fingerprint as a column expression:
    * h = (h*31 + codepoint) mod 1e9+7 folded left-to-right over the
    * characters — the Karp-Rabin document fingerprint, reproduced
    * exactly by the oracle's list_reduce. */
  def rollingFingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => (h * 31L + ascii(c)) % RollingMod)

  /** Bits reserved for the character position in the winnowing packed
    * key — caps documents at 2^21 chars (fail-loud guard below). */
  val WinnowPosBits: Int = 21

  /** Hex digits of md5 used as the k-gram fingerprint: 10 -> a 40-bit
    * hash (packed key stays in 40 + 21 = 61 bits). 40 bits matter at
    * corpus scale: a 32-bit fingerprint over a 10^8-row sketch produces
    * ~10^9 birthday-colliding candidate PAIRS in the near-dup index
    * join (measured: the pair stage, not the join plan, dominated the
    * 1M-doc stress); at 40 bits the same sketch yields ~5M — the
    * candidate volume tracks true duplication again. */
  val WinnowHashHex: Int = 10

  /**
   * Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
   * SIGMOD 2003 — the MOSS algorithm): hash every k-char gram, slide a
   * window of w consecutive hashes, select each window's minimum
   * (leftmost on ties) — any match of length >= k+w-1 is guaranteed
   * caught while keeping ~2/(w+1) of the hashes. Selection is a
   * per-document window MIN over a PACKED key hash*2^21+pos, so
   * "leftmost minimal hash" is plain integer MIN and ties (duplicate
   * k-grams inside a window are common) break identically everywhere.
   * Output: one row per document — fingerprint count and fingerprint
   * sum, certifying the full selected set. Scale: the explode is
   * narrow (the hash is projected before any shuffle) and the window,
   * distinct, and final aggregate all share one doc-id hash
   * partitioning, so the whole operator is ONE shuffle.
   */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame =
    winnowMins(df, idCol, textCol, k, w)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_fp"),
        sum(shiftright(col("mc"), WinnowPosBits)).as("fp_sum"))

  /** Distinct winnowed fingerprint VALUES per document (position
    * dropped) — the per-doc sketch the near-dup miner joins on. Runs
    * the native [[graft.functions.WinnowPostings]] kernel: the sketch
    * is a pure narrow projection (identical values to the windowed
    * [[winnowMins]] pipeline — spec-pinned against the same brute
    * force), where the declarative form shuffled ~one row per corpus
    * CHARACTER through the per-doc window + distinct. */
  def winnowSelections(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        explode(graft.functions.TextFunctions
          .winnowPostings(col(textCol), k, w)).as("__p"))
      .select(col(idCol), col("__p.fp").as("fp"))

  /** The shared winnowing core: distinct selected packed (hash, pos)
    * keys per document. One shuffle — window, distinct, and every
    * downstream per-doc aggregate share the doc-id partitioning. */
  private def winnowMins(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df
      .filter(length(col(textCol)) >= k)
      .select(col(idCol), col(textCol).as("__text"),
        (length(col(textCol)) - (k - 1)).as("np"))
      .withColumn("np",
        when(col("np") >= (1 << WinnowPosBits),
          raise_error(concat(lit("winnow: doc too long for packed key: "),
            col(idCol)))).otherwise(col("np")))
    val hashes = docs
      .select(col(idCol), col("np"),
        explode(sequence(lit(1), col("np"))).as("pos"), col("__text"))
      .select(col(idCol), col("np"), col("pos"),
        (conv(substring(md5(col("__text").substr(col("pos"), lit(k))),
          1, WinnowHashHex), 16, 10).cast("long")
          * (1L << WinnowPosBits) + col("pos"))
          .as("comb"))
    val win = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    hashes
      .withColumn("mc", min(col("comb")).over(win))
      .filter(col("pos") <= greatest(col("np") - (w - 1), lit(1)))
      .select(col(idCol), col("mc")).distinct()
  }
}
