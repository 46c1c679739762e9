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
