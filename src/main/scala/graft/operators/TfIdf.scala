package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus TF-IDF — the standard relevance weighting for training-data
  * curation (keyword extraction, topical filtering, boilerplate demotion).
  *
  * tfidf(d, t) = tf(d, t) · (ln((1 + N) / (1 + df(t))) + 1)
  * (the smoothed idf; identical to scikit-learn's `smooth_idf` without
  * final normalization).
  *
  * Scale shape: two hash aggregations (doc-term counts, then term
  * document-frequencies — both map-side partial) plus a broadcast of the
  * single-row corpus count and of the term→df table when it fits; the
  * only big shuffles are on (doc, term) and term. Top-k per doc goes
  * through row_number, which [[graft.plans.GraftExtensions]] rewrites to
  * the bounded TopKPerGroup operator when installed.
  */
object TfIdf {

  /** Per-doc top-k terms by tf-idf. Ranking uses the ROUNDED score (6
    * decimals) with the term as tiebreak, so ordering is reproducible
    * across engines despite last-ulp differences in ln(). */
  def topTerms(docs: DataFrame, text: Column, id: Column, k: Int = 3): DataFrame = {
    val terms = docs.select(id.as("doc_id"), explode(TextFns.tokens(text)).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    topTermsFromTf(tf, docs.select(count(lit(1)).as("n_docs")), k)
  }

  /** [[topTerms]] from an already-derived (doc_id, term, tf) table (the
    * [[DocTerms]] consumer path). `n` stays a separate 1-row frame: the
    * idf denominator counts ALL docs including token-less ones, which a
    * term table cannot see. */
  def topTermsFromTf(tf: DataFrame, n: DataFrame, k: Int = 3): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        col("tf") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rank"))
  }
}
