package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed byte-pair-encoding (BPE) tokenizer training — the vocab
  * step every LLM data pipeline runs before it can count, pack, or price
  * a corpus in tokens (Sennrich et al. 2016; the GPT-2/sentencepiece
  * recipe, word-internal merges).
  *
  * Scale shape (the classic distributed-BPE factoring):
  *  - the corpus collapses to a DISTINCT-WORD frequency table first —
  *    one shuffle over the tokenized corpus, after which every training
  *    iteration touches words-not-tokens (a ~10^2–10^4× reduction on web
  *    text; at 100 TB the distinct-word table is ~10^8 rows, trivially
  *    partitioned).
  *  - each merge round is one map-side-partial pair-count aggregation
  *    over the cached word table plus a ONE-ROW argmax collect (the
  *    learned merge — bounded driver traffic by construction, k rows
  *    total), then the merge is applied as a narrow codegen projection.
  *  - nothing about a round depends on partitioning, so the word table
  *    is cached once and never re-shuffled.
  *
  * Exactness trick: a word's symbol sequence is carried as a RENDERED
  * STRING — every symbol wrapped in pipes, `[ab, c]` ⇒ `"|ab||c|"` —
  * and applying merge (l, r) is ONE literal string replace of `|l||r|`
  * with `|lr|`. Left-to-right non-overlapping literal replacement on
  * this rendering IS greedy BPE merge application (the leading/trailing
  * pipes make token boundaries unambiguous, so a pair match can neither
  * start mid-token nor capture a token prefix, and consecutive
  * replacements rebuild exactly the fused tokens' rendering — pinned by
  * property test against a reference merger in BpeSpec). Both Spark
  * (`StringReplace`, whole-stage codegen) and the DuckDB oracle
  * (`replace`) ship that exact primitive, which is what makes the whole
  * trainer hash-checkable cross-engine: the oracle re-derives every
  * round's argmax independently, using the learned merges only to
  * roll the rendering forward (SparkEntry.bpeOracle).
  *
  * Determinism: argmax tiebreak is (count DESC, left ASC, right ASC)
  * over binary string order — identical in Spark and DuckDB for the
  * [a-z0-9] symbol alphabet ([[TextFns.tokens]] domain).
  */
object Bpe {

  /** One learned merge: at `step` (1-based), pair (`left`, `right`)
    * had weighted frequency `freq` (the corpus-wide argmax). */
  final case class Merge(step: Int, left: String, right: String, freq: Long)

  /** Trained model: the ordered merge list (the BPE vocab minus the
    * base alphabet). */
  final case class Model(merges: Seq[Merge])

  /** Distinct-word frequency table (word, cnt) over [[TextFns.tokens]]
    * of `text` — the corpus reduction all training rounds run on. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFns.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Initial rendering: each character wrapped in pipes ("abc" ⇒
    * "|a||b||c|"). Words are [a-z0-9]+ so the pipe is never a symbol
    * character. */
  def render(word: Column): Column =
    regexp_replace(word, "(.)", "|$1|")

  /** Greedy left-to-right application of `merges` (in order) to a
    * rendered word — one codegen'd literal replace per merge. */
  def applyMerges(rendered: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(rendered) { (c, m) =>
      call_function("replace", c,
        lit("|" + m.left + "||" + m.right + "|"),
        lit("|" + m.left + m.right + "|"))
    }

  /** Token count of a rendered word: pipes / 2 (each token carries
    * exactly two). */
  def tokenCount(rendered: Column): Column =
    ((length(rendered) -
      length(call_function("replace", rendered, lit("|"), lit("")))) / 2)
      .cast(LongType)

  /** Adjacent-pair rows (l, r, cnt) of a rendered-word frequency table —
    * pair multiplicity within a word counts, weighted by word count.
    * Exposed for the iteration-0 driver query (q_bpe_pairs). */
  def pairCounts(words: DataFrame, rendered: Column): DataFrame = {
    val toks = words
      .select(split(substring(rendered, lit(2), length(rendered) - 2),
          "\\|\\|").as("toks"),
        col("cnt"))
      .filter(size(col("toks")) >= 2)
    toks
      .select(explode(transform(
          sequence(lit(0), size(col("toks")) - 2),
          j => struct(element_at(col("toks"), j + 1).as("l"),
                      element_at(col("toks"), j + 2).as("r"))))
          .as("p"),
        col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** Train `k` merges on a (word, cnt) table. The word table is cached
    * once (released on return); each round re-applies the accumulated
    * replace chain from the cache — k codegen replaces over a distinct-
    * word table is far cheaper than re-materializing the column every
    * round (and keeps the loop shuffle-free). If a round finds no pair
    * (degenerate corpus), training stops early. */
  def train(words: DataFrame, k: Int): Model = {
    require(k >= 1, "k must be >= 1")
    val w = OpCaches.track(words.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var done = false
      var step = 1
      while (step <= k && !done) {
        val top = pairCounts(w, applyMerges(render(col("word")), merges.toSeq))
          .orderBy(col("freq").desc, col("l"), col("r"))
          .limit(1)
          .collect() // the learned merge: one bounded row per round
        if (top.isEmpty) done = true
        else {
          val row = top.head
          merges += Merge(step, row.getString(0), row.getString(1), row.getLong(2))
          step += 1
        }
      }
      Model(merges.toSeq)
    } finally {
      OpCaches.untrack(w)
      w.unpersist(blocking = false)
    }
  }

  /** The learned merge list as a DataFrame (step, left, right, freq) —
    * the driver-checkable training transcript. */
  def mergesDf(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    // lhs/rhs, not left/right: LEFT/RIGHT are reserved words in most SQL
    // dialects, and the driver's compare keys on column names
    m.merges.toDF("step", "lhs", "rhs", "freq")
      .select(col("step").cast(LongType), col("lhs"), col("rhs"), col("freq"))
  }

  /** Encode a corpus with a trained model: per-`group` word and token
    * totals. Tokenization cost rides the same distinct-word reduction as
    * training — encode touches (group, word) rows, not token rows. */
  def encodeStats(docs: DataFrame, group: Column, text: Column,
                  m: Model): DataFrame = {
    val words = docs
      .select(group.as("grp"), explode(TextFns.tokens(text)).as("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("cnt"))
    words
      .select(col("grp"), col("cnt"),
        tokenCount(applyMerges(render(col("word")), m.merges)).as("ntok"))
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).as("n_words"),
           sum(col("cnt") * col("ntok")).as("n_tokens"))
  }
}
