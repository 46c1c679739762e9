package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis Column functions for the documents pipeline.
  *
  * Everything here is built from `org.apache.spark.sql.functions` higher-
  * order / regexp functions — fully codegen'd, no UDFs, no shuffle. Designed
  * for the per-row hot path of a 100 TB document scan: one pass over the
  * text column, all derived metrics share the same extracted token array so
  * Catalyst's common-subexpression elimination collapses the work.
  */
object TextFns {

  /** Lower-cased word tokens (ASCII alnum runs). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Whitespace-delimited token count. */
  def whitespaceTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast(LongType)

  /** BPE-ish piece count: letter runs, digit runs, single other-glyphs. */
  def bpePieceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Count of tokens that appear in `stop` (pass lower-cased stopwords). */
  def stopwordHits(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stop))).cast(LongType)

  // Small per-language stopword lists for the heuristic language ID.
  val StopEn = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "for")
  val StopEs = Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "los")
  val StopDe = Seq("der", "die", "das", "und", "ist", "von", "ein", "zu", "mit", "nicht")
  val StopFr = Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans")

  /** Heuristic language ID: argmax of per-language stopword hits with a
    * fixed priority tie-break (en > es > de > fr), 'und' when no hits.
    * An n-gram model would slot in the same shape; the point is the
    * single-pass, shuffle-free scoring. */
  def langId(toks: Column): Column = {
    val en = stopwordHits(toks, StopEn)
    val es = stopwordHits(toks, StopEs)
    val de = stopwordHits(toks, StopDe)
    val fr = stopwordHits(toks, StopFr)
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Ratio of punctuation (non-alnum, non-space) chars to total chars. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    when(n === 0, lit(0.0)).otherwise(punct.cast(DoubleType) / n.cast(DoubleType))
  }

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(toks: Column): Column = {
    val nt = size(toks)
    when(nt === 0, lit(0.0))
      .otherwise(stopwordHits(toks, StopEn).cast(DoubleType) / nt.cast(DoubleType))
  }

  /** Mean token length. */
  def meanWordLen(toks: Column): Column = {
    val nt = size(toks)
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast(LongType))
    when(nt === 0, lit(0.0)).otherwise(totalLen.cast(DoubleType) / nt.cast(DoubleType))
  }

  /** Gopher/C4-style document keep rule: char count, token count and mean
    * word length inside sane bounds. Thresholds are corpus-specific
    * parameters; the defaults fit prose-like web text. Pure predicate —
    * composes into the scan filter of a curation pass. */
  def qualityKeep(nChars: Column, nTokens: Column, meanWlen: Column,
                  minChars: Int = 100, maxChars: Int = 450,
                  minTokens: Int = 20,
                  minMwl: Double = 2.0, maxMwl: Double = 10.0): Column =
    nChars >= minChars && nChars <= maxChars && nTokens >= minTokens &&
      meanWlen >= minMwl && meanWlen <= maxMwl
}
