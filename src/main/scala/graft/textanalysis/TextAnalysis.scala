package graft.textanalysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, n-gram-heuristic language ID. All single-pass column
  * expressions — no UDFs, no shuffles; they vectorize inside whole-stage
  * codegen and scale linearly with the scan.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count; empty/blank input counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword-boundary token count: GPT-2-style pre-tokenizer
    * pattern (contraction suffixes, space-prefixed letter runs, digit
    * runs, punctuation runs). A real tokenizer's merge step happens on
    * top of this split; the count is the standard corpus-size estimate.
    */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Share of tokens that are stopwords (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("double") / n)
  }

  /** Share of punctuation characters in the raw text. */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(text, "[.,;:!?'\"()-]", ""))).cast("double") / len)
  }

  /** Mean token length (characters, whitespace excluded). */
  def avgWordLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double") / n)
  }

  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Composite quality score in [0,1]:
    * 0.3*min(tokens/50,1) + 0.3*stopword_ratio + 0.2*(1-punct_ratio)
    * + 0.2*min(avg_word_len/8,1) — weights mirror the usual
    * length/stopword/punctuation heuristics for web-scale corpus filtering.
    */
  def qualityScore(text: Column,
                   stopwords: Seq[String] = DefaultStopwords): Column = {
    val raw =
      least(tokenCount(text).cast("double") / 50.0, lit(1.0)) * 0.3 +
        stopwordRatio(text, stopwords) * 0.3 +
        (lit(1.0) - punctRatio(text)) * 0.2 +
        least(avgWordLen(text) / 8.0, lit(1.0)) * 0.2
    // arithmetic 3-decimal rounding: round() on doubles goes through the
    // shortest decimal repr and disagrees across engines at .xxx5
    // boundaries; floor(x*1000+0.5)/1000 is pure double math every engine
    // computes identically
    floor(raw * 1000.0 + 0.5) / 1000.0
  }

  /** Word n-grams: each window of `n` consecutive whitespace tokens,
    * space-joined. Null text yields null (explode skips it); blank or
    * shorter-than-n text yields an empty array. The `size < n` guard
    * matters: Spark's `sequence(1, 0)` DESCENDS to [1, 0] instead of
    * returning empty. Pure expression, no shuffle.
    *
    * The token array is BOUND to a lambda variable via a one-element
    * `transform` before the gram windows are built: expression trees
    * have no let-binding, so referencing the `split` subtree directly
    * inside the window lambda re-tokenizes the text once per gram
    * element (measured 4x slower on the documents corpus — the split is
    * the dominant cost, not the windowing).
    */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    val gramsOf = (t: Column) =>
      // tokens("") is [""], not []: the element_at check catches blank text
      when(size(t) < n || (size(t) === 1 && element_at(t, 1) === ""),
        array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j))): _*)))
    flatten(transform(array(tokens(text)), gramsOf))
  }

  /** Corpus-level n-gram frequency: the k most frequent word n-grams
    * with deterministic (count desc, gram) tie-ordering. One explode +
    * one partial-aggregating groupBy (map-side combine shrinks the
    * shuffle to unique grams per task) + TakeOrderedAndProject — no
    * global sort. The frequency table is the standard corpus-statistics
    * input for contamination checks and boilerplate detection.
    */
  def topNgrams(df: org.apache.spark.sql.DataFrame, textCol: String,
                n: Int, k: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(ngrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /** Marker words per language for the n-gram-heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "y"),
    "fr" -> Seq("le", "les", "et", "une"),
    "de" -> Seq("der", "die", "und", "das"))

  private def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** Heuristic language ID: argmax of marker-word hits with a fixed
    * priority order (en > es > fr > de) for ties; no hit at all -> "und".
    */
  def langId(text: Column): Column = {
    val counts = LangMarkers.map { case (lang, markers) =>
      lang -> markerCount(text, markers)
    }
    val total = counts.map(_._2).reduce(_ + _)
    val best = counts.zipWithIndex.foldRight(lit("und")) {
      case (((lang, cnt), idx), elseExpr) =>
        val beatsLater = counts.drop(idx + 1).map(_._2)
          .foldLeft(lit(true))((acc, c) => acc && cnt >= c)
        when(beatsLater, lit(lang)).otherwise(elseExpr)
    }
    when(total === 0, lit("und")).otherwise(best)
  }
}
