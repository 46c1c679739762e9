package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact all-pairs set-similarity join via prefix filtering (the
  * AllPairs / PPJoin family — Bayardo, Ma, Srikant, "Scaling Up All
  * Pairs Similarity Search", WWW 2007; a public algorithm).
  *
  * Complements the MinHash-LSH path (Dedup.minhashNearDupPairs): LSH is
  * probabilistic (tunable false-negative rate), this join is EXACT —
  * zero false negatives — at the cost of a candidate set that grows with
  * token-frequency skew. Production pipelines use LSH for web-scale
  * near-dup sweeps and the exact join where recall must be 1.0
  * (compliance takedowns, benchmark decontamination audits).
  *
  * The scale shape (reference semantics: the same "find similar pairs"
  * capability the Glue jobs' dedup stage implies — raw_to_conformed.py
  * has no analogue, this is a beyond-reference training-data operator):
  *
  *  1. one corpus-wide agg for global token document-frequency (df);
  *  2. each doc's distinct tokens are sorted by (df, token) — rarest
  *     first. The pair (df, token) IS the shared total order, so no
  *     global row_number / zipWithIndex rank is ever materialized (a
  *     global rank would funnel the vocabulary through one task);
  *  3. each doc emits only its PREFIX tokens — the first
  *     |x| - ceil(t·|x|) + 1 under the shared order. Any pair with
  *     J >= t overlaps in at least ceil(t·max(|a|,|b|)) tokens, so
  *     skipping fewer than that many from both sorted sets cannot miss
  *     every shared token: prefix-colliding candidates are a SUPERSET of
  *     the true result. The candidate join is an equi-join on (rare)
  *     prefix tokens — never an all-pairs cross;
  *  4. the length filter t·max(|a|,|b|) <= min(|a|,|b|) prunes
  *     candidates before any token array is touched;
  *  5. exact Jaccard verification runs on surviving candidates only.
  *
  * Every stage is a keyed shuffle (token or doc id) — AQE skew-split
  * applies; nothing is collected to the driver. The token-set table is
  * persisted once and feeds prefix emission + both verify sides (three
  * consumers; without the cache the tokenize+sort pipeline would run 3×).
  */
object AllPairs {

  /** Word-token Jaccard similarity join over (id, text) rows: all pairs
    * with J(tokens(a), tokens(b)) >= threshold, id_a < id_b. Tokens are
    * the distinct lowercase [a-z0-9]+ runs (the corpus convention shared
    * with the MinHash/TF-IDF operators). */
  def jaccardJoin(docs: DataFrame, id: Column, text: Column,
                  threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val toks = docs
      .select(id.as("doc_id"), text.as("text"))
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "[^a-z0-9]+")))
          .as("token"))
      .filter(col("token") =!= "")
    // global document frequency — the ordering key for prefix selection
    val df = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // per-doc token list sorted rarest-first by (df, token); struct sort
    // is lexicographic, so the order is total and identical on every doc
    val sets = OpCaches.track(
      toks.join(df, "token")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("token"))))
          .as("ord"))
        .select(col("doc_id"),
          expr("transform(ord, x -> x.token)").as("tokens"),
          size(col("ord")).as("sz"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // prefix length |x| - ceil(t|x|) + 1 (>=1 for any non-empty set);
    // posexplode keeps each prefix token's 1-based position for the
    // positional filter below
    val prefixes = sets.select(col("doc_id"), col("sz"),
      posexplode(slice(col("tokens"), lit(1),
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))))
      .withColumnRenamed("pos", "p")
      .withColumnRenamed("col", "token")
      .withColumn("p", col("p") + 1)
    // candidates: prefix-token collision + length filter; then PPJoin's
    // POSITIONAL filter (Xiao et al., WWW'08): among SHARED prefix
    // tokens the first in a's order is also first in b's (the order is
    // global), so min(i) and min(j) across a pair's collisions belong
    // to the same token, and every common token sits at position >= i
    // in a and >= j in b — overlap <= 1 + min(|a|-i, |b|-j). Pairs
    // whose bound can't reach the required overlap t/(1+t)·(|a|+|b|)
    // are pruned BEFORE any token array is fetched. On a templated
    // corpus (prefix tokens shared by hundreds of docs) this cuts
    // candidates several-fold; the groupBy replaces the distinct at
    // the same shuffle cost.
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.token") === col("b.token") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(threshold) * greatest(col("a.sz"), col("b.sz")))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .agg(min(col("a.p")).as("ia"), min(col("b.p")).as("jb"))
      .filter((lit(1) + least(col("sa") - col("ia"), col("sb") - col("jb")))
        .cast("double") >=
        lit(threshold / (1.0 + threshold)) * (col("sa") + col("sb")))
      .select(col("id_a"), col("id_b"))
    // exact verification on candidates only
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("tokens").as("ta"),
        col("sz").as("sa")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("tokens").as("tb"),
        col("sz").as("sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      // filter on the RAW ratio (the oracle's form), round only for
      // output — rounding first would admit pairs just under threshold
      .withColumn("jac_raw", col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")))
      .filter(col("jac_raw") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jac_raw"), 6).as("jaccard"))
  }
}
