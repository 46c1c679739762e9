package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rank-statistic rollups over a scored, binary-labeled table.
  *
  * ROC AUC by the Mann–Whitney identity: AUC = P(score⁺ > score⁻) with
  * ties counted half, which over tie groups at midrank r̄ is
  *
  *   AUC = (Σ_g pos_g · 2r̄_g  −  n₁(n₁+1)) / (2 · n₁ · n₀)
  *
  * computed RELATIONALLY in the q_mann_whitney shape: one groupBy on
  * the exact integer score grid (never a per-row rank window over the
  * corpus), tie-group midranks 2r̄ = 2·(rows before) + t + 1 on the
  * DISTINCT-score table, DECIMAL(38,0) cross-products so 2U stays an
  * exact integer end-to-end, and only the final divisions round (6 dp).
  * The one ordered pass runs over distinct scores — bounded by the
  * score grid (round-6 micro-units here), not the corpus.
  */
object RankStats {

  /** One-row AUC summary of `scored`: n_pos, n_neg, u2 (= 2·U, exact),
    * auc (round-6) and gini_rank (= 2·auc − 1, round-6 of the exact
    * integer ratio). `score` must already be an exact integer grid
    * (e.g. round-6 logits in micro-units) and `label` 0/1 Long. */
  def aucByMidrank(scored: DataFrame, score: Column, label: Column): DataFrame = {
    val grp = scored
      .select(score.as("s"), label.as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("t"), sum(col("y")).as("pos"))
    val w = Window.orderBy(col("s"))
    val d19 = (c: Column) => c.cast(DecimalType(19, 0))
    val ranked = grp
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("ar2", lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L))
    val u2 = (col("r2p") - d19(col("n_pos")) * d19(col("n_pos") + 1))
    // single-class guard (r16 ADVICE): with n_pos=0 or n_neg=0 AUC is
    // undefined — Spark's Divide would yield NULL while DuckDB's double
    // division yields ±inf/NaN, so the guard makes the degenerate case
    // an EXPLICIT NULL on both engines (the q_rolling_corr convention)
    val degenerate = col("n_pos") === 0 || col("n_neg") === 0
    ranked.agg(
        sum(col("pos")).as("n_pos"),
        sum(col("t") - col("pos")).as("n_neg"),
        sum(d19(col("pos")) * d19(col("ar2"))).as("r2p"))
      .select(col("n_pos"), col("n_neg"),
        u2.cast(LongType).as("u2"),
        when(degenerate, lit(null).cast(DoubleType))
          .otherwise(round(u2.cast(DoubleType)
            / (lit(2.0) * col("n_pos").cast(DoubleType)
              * col("n_neg").cast(DoubleType)), 6)).as("auc"),
        when(degenerate, lit(null).cast(DoubleType))
          .otherwise(round((u2.cast(DoubleType)
            - col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType))
            / (col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType)),
            6)).as("gini_rank"))
  }
}
