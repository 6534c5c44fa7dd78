package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators.
  * All pure `org.apache.spark.sql.functions` compositions (codegen'd, no
  * UDFs) so they stay inside whole-stage codegen and push work to
  * executors unchanged at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization. TESTDATA text is single-space separated; a
    * literal-space split keeps exact parity with the DuckDB oracle's
    * string_split(text, ' '). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** JVM-side twin of [[tokens]] for the typed flatMap hot paths:
    * `split(" ", -1)` keeps trailing empty tokens (Spark's `split`
    * and DuckDB's `string_split` both do — plain `String.split(char)`
    * silently drops them, a latent count divergence on texts ending
    * in a separator), and `Locale.ROOT` keeps lowercasing independent
    * of the executor's default locale. Every JVM tokenizer that feeds
    * an oracle-checked count must go through this. */
  def jvmTokens(t: String): Array[String] =
    t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)

  /** Word n-gram shingles as space-joined strings:
    * shingle i = tokens[i..i+n-1], for i in 0 .. size-n. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => size(split(s, " ")) === n)
  }

  /** Count of tokens equal to any of the given words (duplicates counted,
    * matching the DuckDB oracle's list_filter + len). */
  def tokenMatchCount(toks: Column, words: Seq[String]): Column = {
    val isMatch: Column => Column =
      t => words.map(w => t === w).reduce(_ || _)
    size(filter(toks, isMatch))
  }

  /** BPE-ish subword-count estimate: each whitespace token counts as
    * ceil(len/4) subwords (one per ~4 chars) — a deterministic
    * stand-in for a real tokenizer's token count, mirrored exactly by
    * the q27 oracle. */
  def approxBpeTokenCount(text: Column): Column = {
    val toks = tokens(text)
    // ceil(len/4) per word, summed — integer arithmetic only.
    aggregate(toks, lit(0), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("int"))
  }
}
