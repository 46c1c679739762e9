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

  /** Whitespace-delimited token count — native byte-walk kernel (the
    * regexp_extract_all form allocates every token String just to count
    * them). */
  def whitespaceTokenCount(text: Column): Column =
    graft.plans.TextKernels.wsTokenCount(text).cast(LongType)

  /** Count of [[tokens]] without materializing the token array — native
    * run-count kernel, for count-only callers.
    *
    * Known boundary: equals size(tokens(text)) except on code points whose
    * full-Unicode lowercase maps INTO [a-z] (U+212A KELVIN SIGN → 'k',
    * U+0130 → 'i'+U+0307): the byte-walk counts raw bytes, the regex form
    * counts the lowercased expansion. Normalize such text upstream if
    * exact parity on arbitrary Unicode matters (KernelPropertySpec
    * documents the exclusion). */
  def tokenCount(text: Column): Column =
    graft.plans.TextKernels.wordRunCount(text).cast(LongType)

  /** BPE-ish piece count: letter runs, digit runs, single other-glyphs —
    * native byte-walk kernel (count-only, no per-piece allocation). */
  def bpePieceCount(text: Column): Column =
    graft.plans.TextKernels.bpePieces(text).cast(LongType)

  /** Count of tokens that appear in `stop` (pass lower-cased stopwords).
    * Native codegen kernel (graft.plans.StopwordHits) — the interpreted
    * `size(filter(_.isInCollection))` HOF costs a closure call + In-list
    * scan per token, and langId runs four of these per row. */
  def stopwordHits(toks: Column, stop: Seq[String]): Column =
    graft.plans.TextKernels.stopwordHits(toks, stop).cast(LongType)

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

  /** Ratio of punctuation (non-alnum, non-space) chars to total chars.
    * The count is a native byte-walk kernel (graft.plans.PunctCount) —
    * `size(regexp_extract_all(text, "[^A-Za-z0-9\\s]"))` allocates one
    * single-char String per punctuation mark (measured 20× slower at
    * bench scale for the same answer). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val punct = graft.plans.TextKernels.punctCount(text)
    when(n === 0, lit(0.0)).otherwise(punct.cast(DoubleType) / n.cast(DoubleType))
  }

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(toks: Column): Column = {
    val nt = size(toks)
    when(nt === 0, lit(0.0))
      .otherwise(stopwordHits(toks, StopEn).cast(DoubleType) / nt.cast(DoubleType))
  }

  /** Mean token length (length sum is a native codegen kernel — the
    * interpreted aggregate() fold allocated a closure call per token). */
  def meanWordLen(toks: Column): Column = {
    val nt = size(toks)
    val totalLen = graft.plans.TextKernels.tokenLenSum(toks)
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

  // ----- cleaning / normalization (C4-style pre-processing) -------------

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Strip control characters and zero-width/format glyphs (the usual web
    * crud: NUL..US except \t\n, DEL, ZWSP/ZWNJ/ZWJ, BOM). */
  def stripControl(text: Column): Column =
    regexp_replace(text,
      "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u200b\\u200c\\u200d\\ufeff]", "")

  /** Drop lines that don't look like prose: fewer than `minWords` words or
    * no terminal punctuation (the C4 line-level boilerplate rule). */
  def keepProseLines(text: Column, minWords: Int = 3): Column =
    array_join(
      filter(split(text, "\n"), l =>
        size(split(trim(l), " ")) >= minWords && trim(l).rlike("[.!?]\"?$")),
      "\n")

  /** Collapse immediate token repeats ("the the the" → "the") — a cheap,
    * high-yield crawl-noise rule.
    *
    * `toks` MUST be a materialized column (project the token array first):
    * the previous-element lookup references it inside the lambda, and an
    * embedded expression would re-evaluate per element (the SURVEY §7
    * trap). greatest(i,1) keeps element_at's index legal at i=0, where the
    * left disjunct already decides. */
  def dedupeConsecutiveTokens(toks: Column): Column =
    filter(toks, (t, i) => i === 0 || t =!= element_at(toks, greatest(i, lit(1))))

  // ----- chunking (context-window shaping for training pipelines) -------

  /** Fixed-size token-window chunks: windows of `chunkSize` tokens taken
    * every `stride` tokens (stride == chunkSize → disjoint cover;
    * stride < chunkSize → overlapping windows). Returns an array of
    * structs (chunk_id, toks); explode it to get one row per chunk.
    *
    * `toks` MUST be a materialized column (see dedupeConsecutiveTokens).
    * All work is row-local inside the scan stage — chunking a 100 TB
    * corpus is one map pass, no shuffle. */
  def tokenChunks(toks: Column, chunkSize: Int, stride: Int): Column =
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
        start => struct(
          (start / stride).cast(LongType).as("chunk_id"),
          slice(toks, start + 1, lit(chunkSize)).as("toks"))),
      c => size(c.getField("toks")) > 0)
}
