package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding (BPE) tokenizer-training primitives: the
 * distributed merge-candidate counting pass and the greedy merge loop.
 *
 * The expensive part of BPE training at corpus scale is counting
 * adjacent symbol pairs — a pure explode + partial-aggregated groupBy
 * (one shuffle of O(distinct pairs) rows, independent of corpus size
 * after the map-side combine). The argmax and merge-table are O(vocab)
 * driver state, exactly like the reference selector's criterion array.
 * Applying a merge is a narrow per-row array fold (no shuffle), so each
 * merge round costs one scan + one tiny aggregate — (k) scans for k
 * merges, the same cost model as the greedy selector loop.
 */
object Bpe {

  /**
   * Round-1 merge-candidate counts: adjacent character-pair frequencies
   * over all words of the corpus, ranked (count desc, pair asc).
   * The first BPE iteration's candidate table. Pair generation is the
   * native [[graft.functions.CharPairs]] expression - one codegen'd
   * scan, no interpreted lambda frame per character.
   */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(graft.functions.TextFunctions.charPairs(col("w")))
        .as("pair"))
      .groupBy("pair").agg(count("*").as("cnt"))

  /** Symbol-array representation of every word in the corpus:
    * one row per word, `syms` = its characters. */
  def corpusSymbols(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .select(split(col("w"), "").as("syms"))

  /** Adjacent-pair counts over a symbol-array corpus. */
  def symbolPairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("syms")) >= 2)
      .select(explode(graft.functions.TextFunctions.adjacentPairs(col("syms")))
        .as("pair"))
      .groupBy("pair").agg(count("*").as("cnt"))

  /** Apply one merge (x, y) -> xy to a symbol array: greedy
    * left-to-right non-overlapping, as standard BPE does - the native
    * [[graft.functions.MergePair]] single-scan expression (the HOF
    * fold rebuilt the accumulator array per element, O(len^2)
    * allocations per word). */
  def mergeFold(syms: Column, x: String, y: String): Column =
    graft.functions.TextFunctions.mergePair(syms, x, y)

  /**
   * Greedy BPE training: `numMerges` rounds of (count pairs -> pick
   * most frequent, ties to lexicographically smallest -> merge
   * everywhere). Returns the learned merge table in order.
   *
   * Trains over the WORD-FREQUENCY table, the classic BPE-trainer
   * shape: the corpus is touched exactly once (a word count - one
   * partial-aggregated shuffle, the vocab_topk pass), and every merge
   * round then scans only the VOCABULARY with per-word multiplicities
   * as aggregation weights. Pair counts are identical to corpus-level
   * counting (each in-word occurrence weighted by the word's count),
   * but a round's cost is O(vocab), independent of corpus size - at
   * 100 TB the vocabulary is millions of rows while the corpus is
   * trillions of words. Each round localCheckpoints the (tiny) symbol
   * vocabulary to keep the plan flat.
   */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    var vocab = df.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count("*").as("wcnt"))
      .select(split(col("w"), "").as("syms"), col("wcnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(explode(graft.functions.TextFunctions.adjacentPairs(col("syms")))
          .as("pair"), col("wcnt"))
        .groupBy("pair").agg(sum("wcnt").as("cnt"))
        .orderBy(desc("cnt"), asc("pair")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pairStr = top(0).getString(0)
        val sep = pairStr.indexOf(' ')
        require(sep >= 0, s"malformed pair key [$pairStr]")
        val x = pairStr.substring(0, sep)
        val y = pairStr.substring(sep + 1)
        merges += ((x, y))
        vocab = vocab.select(mergeFold(col("syms"), x, y).as("syms"),
          col("wcnt")).localCheckpoint()
      }
      round += 1
    }
    merges.result()
  }

  /** Segment a word with a learned merge table (driver-side utility,
    * mirrors what a tokenizer would ship): applies merges in order. */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    // iterate CODE POINTS, not UTF-16 chars — the distributed kernels
    // (split(w, ""), CharPairs) are codepoint-aware, and surrogate-half
    // symbols would never match merges learned over codepoints
    var syms: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    merges.foreach { case (x, y) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
          out += (x + y); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }
}
