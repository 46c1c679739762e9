package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-quantized (SQ8) ANN — the flat-compressed rung of the ANN
  * ladder between brute force and IVF/PQ (faiss IndexScalarQuantizer):
  * each dimension is affinely coded into one byte against the corpus'
  * per-dimension [min, max], candidates are scanned in the CODE domain
  * (8× less scan bandwidth than floats — at 100 TB the scan is memory-
  * bound, so that is the speedup), and only the shortlist re-joins the
  * float table for the exact rerank.
  *
  * Unlike VectorFns.quantizeInt8 (symmetric per-VECTOR absmax — a
  * compression primitive), SQ8 trains per-DIMENSION ranges on the
  * corpus and searches asymmetrically: the query stays full-precision
  * and scores against each candidate's dequantized midpoint
  * x̂_j = mn_j + (code_j + 0.5)·(mx_j − mn_j)/256-ish grid. Ranges are
  * exact min/max aggregates, so the whole lane — codes, approximate
  * scores, shortlist, rerank — is derivable in SQL with no trained
  * model to ship (the one ANN lane whose oracle needs no literals).
  *
  * Determinism: codes are floor() of an identical double expression on
  * both engines (clamped to [0,255] for intent, though in-range inputs
  * cannot escape it); approximate scores round at 6 with candidate-id
  * tiebreaks; the rerank is the house cosine6. */
object SqAnn {

  /** 1-row frame (mn_arr, mx_arr): per-dimension corpus min/max in
    * dimension order. Exact value picks — order-independent. */
  def dimStats(corpus: DataFrame): DataFrame =
    corpus.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast(DoubleType)).as("mn"),
        max(col("x").cast(DoubleType)).as("mx"))
      .agg(
        transform(sort_array(collect_list(struct(col("pos"), col("mn")))),
          e => e("mn")).as("mn_arr"),
        transform(sort_array(collect_list(struct(col("pos"), col("mx")))),
          e => e("mx")).as("mx_arr"))

  // Loop bounds derive from size(mn_arr) — the trained per-dimension
  // stats — so the scan is dimension-generic (r15, ADVICE: the former
  // hard-coded sequence(1, 64) silently truncated wider corpora and
  // broke element_at on narrower ones). dimStats' posexplode guarantees
  // len(mn_arr) == the corpus' embedding width.
  private val codesExpr =
    """transform(sequence(1, size(mn_arr)), j ->
      |  CASE WHEN element_at(mx_arr, j) = element_at(mn_arr, j)
      |    THEN CAST(0 AS BIGINT)
      |    ELSE least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
      |      CAST(floor((CAST(element_at(c_emb, j) AS DOUBLE)
      |          - element_at(mn_arr, j)) * 255.0
      |        / (element_at(mx_arr, j) - element_at(mn_arr, j)))
      |        AS BIGINT))) END)""".stripMargin

  private val approxExpr =
    """round(aggregate(
      |  zip_with(q_emb, transform(sequence(1, size(mn_arr)), j ->
      |    element_at(mn_arr, j)
      |      + (CAST(element_at(codes, j) AS DOUBLE) + 0.5)
      |        * (element_at(mx_arr, j) - element_at(mn_arr, j)) / 255.0),
      |    (a, b) -> CAST(a AS DOUBLE) * b),
      |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 6)""".stripMargin

  /** SQ8 scan INSIDE the spilled-IVF index (r15 — the frontier combo
    * the r14 verdict asked for): candidates meet queries in up to
    * `spill` shared cells ([[IvfAnn.assignCells]] multi-assignment,
    * the 25%-budget recall winner on isotropic data), but the cell
    * scan reads 1-byte-per-dimension CODES instead of floats — at
    * 100 TB the probed-cell scan is memory-bandwidth-bound, so the 8×
    * compression is the speedup — and only the per-query `shortlist`
    * by approximate score re-joins the float table for the exact
    * cosine rerank. Pair-visits (duplicates across shared cells
    * included) are the honest scan cost, identical to the plain
    * spilled lane's — SQ8 changes the bandwidth per visit, not the
    * visit count; the q_ann_tuned frontier row records what the
    * rerank shortlist costs in recall (none, at shortlist ≥ the
    * per-query candidate count). Deterministic: approx rounds at 6
    * with cand_id tiebreaks, duplicates collapse by max (the value is
    * identical per copy), rerank is the house cosine6. */
  def topKSpillSq8(queries: DataFrame, corpus: DataFrame, k: Int,
                   model: IvfAnn.Model, nProbe: Int, spill: Int,
                   shortlist: Int): DataFrame = {
    val stats = dimStats(corpus)
    val coded = corpus.crossJoin(broadcast(stats))
      .select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb"), col("mn_arr"), col("mx_arr"))
      .select(col("cand_id"), expr(codesExpr).as("codes"),
        explode(IvfAnn.assignCells(col("c_emb"), model, spill)).as("cell"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(IvfAnn.probeCells(col("embedding"), model, nProbe)).as("cell"))
    val scored = coded.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("cand_id"), expr(approxExpr).as("approx"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(max(col("approx")).as("approx"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("cand_id"))
    val short = scored
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
      .drop("srank")
    val rr = short
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb")), "cand_id")
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb")), "query_id")
      .select(col("query_id"), col("cand_id"), col("approx"),
        VectorFns.cosine6(col("q_emb"), col("c_emb")).as("cosine"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    rr.withColumn("rank", row_number().over(wr).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Top-k by exact cosine over an SQ8-scanned shortlist. Queries keep
    * full precision (asymmetric distance); candidates are scanned as
    * codes only, floats re-fetched for the shortlist. */
  def topK(queries: DataFrame, corpus: DataFrame,
           shortlist: Int, k: Int): DataFrame = {
    val stats = dimStats(corpus)
    val codes = corpus.crossJoin(broadcast(stats))
      .select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb"), col("mn_arr"), col("mx_arr"))
      .select(col("cand_id"), expr(codesExpr).as("codes"))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = codes.crossJoin(broadcast(stats))
      .join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), expr(approxExpr).as("approx"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("cand_id"))
    val short = scored
      .withColumn("srank", row_number().over(ws)).filter(col("srank") <= shortlist)
      .drop("srank")
    val rr = short
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb")), "cand_id")
      .join(q, "query_id")
      .select(col("query_id"), col("cand_id"), col("approx"),
        VectorFns.cosine6(col("q_emb"), col("c_emb")).as("cosine"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    rr.withColumn("rank", row_number().over(wr).cast(LongType))
      .filter(col("rank") <= k)
  }
}
