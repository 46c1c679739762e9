package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the standard leakage check
  * (GPT-3-style 13-gram collision test) every serious training corpus runs
  * before a model sees it.
  *
  * Scale shape (the benchmark side is always tiny — thousands of eval
  * docs — while the training side is the 100 TB corpus):
  *  - both sides expand to DISTINCT word n-grams row-locally (explode is
  *    map-side; a doc's grams never shuffle as a set);
  *  - the benchmark gram set is deduped and BROADCAST, so the training
  *    scan drops non-colliding grams map-side — the only shuffle is the
  *    final per-doc aggregation of the (rare) hits;
  *  - gram strings are fine at benchmark scale; swap in hashed grams
  *    (graft.plans.Signatures) if an eval suite ever outgrows broadcast.
  */
object Decontaminate {

  /** Distinct word `n`-grams of an already-materialized token array. */
  private def grams(toks: Column, n: Int): Column = Dedup.wordShinglesOf(toks, n)

  /** (doc_id, gram) rows — one per DISTINCT gram per doc. */
  def docGrams(docs: DataFrame, text: Column, id: Column, n: Int): DataFrame =
    docs.select(id.as("doc_id"), TextFns.tokens(text).as("toks"))
      .select(col("doc_id"), explode(grams(col("toks"), n)).as("gram"))

  /** Training docs sharing >= 1 word n-gram with the benchmark set:
    * (doc_id, n_shared_grams), one row per contaminated training doc.
    * Flagged docs are then dropped or span-redacted upstream. */
  def contaminated(train: DataFrame, benchmark: DataFrame,
                   text: Column, id: Column, n: Int = 13): DataFrame = {
    val benchGrams = docGrams(benchmark, text, id, n)
      .select(col("gram")).distinct()
    docGrams(train, text, id, n)
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Span-level redaction — the REMOVAL half of n-gram decontamination
    * (the q_substring_strip policy applied to eval leakage): instead of
    * dropping a contaminated document wholesale, cut exactly the token
    * spans that collide with a benchmark n-gram and keep the rest. The
    * output is the redacted token stream (training pipelines tokenize
    * anyway; re-joining surviving tokens with single spaces is the
    * canonical normalized form).
    *
    * Scale shape: gram extraction is row-local; the benchmark gram set
    * broadcasts; the flagged START positions are rare, so the per-doc
    * covered-position arrays aggregate from almost nothing and BROADCAST
    * back — the corpus-side removal is then one map-side array filter
    * (`filter(toks, (t, i) -> !contains(cover, i))`). No shuffle ever
    * touches the training corpus.
    *
    * Emits (doc_id, n_tokens, n_removed, clean_text) for EVERY training
    * doc — uncontaminated docs pass through with n_removed = 0.
    *
    * `broadcastCover` (default true) asserts contamination is sparse —
    * the normal case for a benchmark suite. A PATHOLOGICAL benchmark
    * whose grams are common phrases covers a large corpus fraction and
    * makes the cover table corpus-sized; set it false there and the
    * cover join degrades to a plain shuffle join on doc_id instead of
    * an oversized broadcast. */
  def stripContaminated(train: DataFrame, benchmark: DataFrame,
                        text: Column, id: Column, n: Int = 13,
                        broadcastCover: Boolean = true): DataFrame = {
    val benchGrams = docGrams(benchmark, text, id, n)
      .select(col("gram")).distinct()
    val toks = train.select(id.as("doc_id"), TextFns.tokens(text).as("toks"))
    // indexed gram starts (0-based); the CASE guards Spark's descending
    // sequence(0, negative) on docs shorter than n tokens
    val starts = toks.select(col("doc_id"), explode(expr(
        s"CASE WHEN size(toks) < $n THEN array() " +
          s"ELSE transform(sequence(0, size(toks) - $n), " +
          s"p -> struct(p AS p, concat_ws(' ', slice(toks, p + 1, $n)) AS gram)) END"))
        .as("g"))
      .select(col("doc_id"), col("g.p").as("p"), col("g.gram").as("gram"))
    val cover = starts.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(array_sort(array_distinct(flatten(collect_list(
        expr(s"sequence(p, p + ${n - 1})"))))).as("cover"))
    toks.join(if (broadcastCover) broadcast(cover) else cover,
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(size(col("cover")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ", expr(
          "CASE WHEN cover IS NULL THEN toks " +
            "ELSE filter(toks, (t, i) -> NOT array_contains(cover, i)) END"))
          .as("clean_text"))
  }

  /** Embedding-space decontamination — the semantic complement of the
    * n-gram test: flag training vectors whose cosine to ANY benchmark
    * vector reaches `threshold` (paraphrased eval leakage that exact
    * n-grams miss). Emits (vec_id, n_hits, max_cosine) per contaminated
    * training vector.
    *
    * Scale shape mirrors [[contaminated]]: the benchmark side is always
    * tiny, so it broadcasts and the 100 TB training side is ONE map-side
    * scan — per row, a codegen cosine against each broadcast bench
    * vector, then the (rare) hits aggregate per vec_id. No shuffle
    * touches the corpus; swap in the IVF/LSH index when an eval suite
    * ever outgrows broadcast. */
  def contaminatedByEmbedding(train: DataFrame, benchmark: DataFrame,
                              threshold: Double): DataFrame = {
    val bench = benchmark.select(col("vec_id").as("bench_id"),
      col("embedding").as("bench_emb"))
    train.select(col("vec_id"), col("embedding"))
      .join(broadcast(bench))
      .select(col("vec_id"),
        graft.functions.VectorFns.cosine6(col("embedding"), col("bench_emb"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cosine"))
  }
}
