package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star ops,
  * BASELINE.json): language ID, quality scoring, token counting, document
  * fingerprinting. All pure `functions._` Column combinators — whole-stage
  * codegen end to end, no UDFs, so each scales to 100 TB as a single narrow
  * map over the corpus.
  */
object TextAnalysis {

  /** Whitespace token count (the cheap tokenizer). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: word-boundary regex segments + digits + punct,
    * approximating a byte-pair tokenizer's granularity without a vocab.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Ratio helpers (0.0 when the document is empty). */
  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  def alphaRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^A-Za-z]", "")), length(text))
  def digitRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^0-9]", "")), length(text))
  def punctRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")), length(text))
  def upperRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^A-Z]", "")), length(text))
  def whitespaceRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, "\\s", "")), length(text))
  def meanWordLen(text: Column): Column =
    ratio(length(regexp_replace(text, "\\s+", "")), tokenCount(text))

  /** Stopword hit-rate against a tiny English core list — a strong cheap
    * English-fluency signal.
    */
  val enStopwords = Seq("the", "and", "of", "to", "in", "is", "that", "it",
    "for", "was", "with", "his", "her", "this", "have", "not", "are", "but")
  def stopwordRatio(text: Column): Column = {
    val pat = enStopwords.mkString("(?i)\\b(", "|", ")\\b")
    ratio(regexp_count(text, lit(pat)), tokenCount(text))
  }

  /** Composite quality score in [0,1]: fluent prose scores high; symbol soup,
    * ALL-CAPS, and digit dumps score low.
    */
  def qualityScore(text: Column): Column = {
    val s = alphaRatio(text) * 0.5 +
      least(stopwordRatio(text) * lit(2.0), lit(1.0)) * 0.3 +
      (lit(1.0) - upperRatio(text)) * 0.1 +
      (lit(1.0) - least(digitRatio(text) * lit(4.0), lit(1.0))) * 0.1
    round(s, 4)
  }

  /** Marker-word counts per language — deterministic, SQL-expressible n-gram
    * heuristic (the oracle replicates it 1:1 in DuckDB).
    */
  private def markerCount(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(words.mkString("\\b(", "|", ")\\b")))
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "with", "that", "this", "for"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "como", "pero"))

  /** Predicted language: arg-max of marker counts with fixed tie-break order
    * (first listed wins), "und" (undetermined) when nothing matches.
    */
  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (l, ws) => (l, markerCount(text, ws)) }
    val best = counts.map(_._2).reduce(greatest(_, _))
    counts.foldRight(lit("und")) { case ((l, c), rest) =>
      when(best > 0 && c === best, lit(l)).otherwise(rest)
    }
  }

  /** Content fingerprint: MD5 of case-folded, punctuation-stripped,
    * whitespace-collapsed text — robust to formatting-only edits.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " ")))
}
