package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
  * LASER/CCMatrix recipe): given two embedding corpora A and B (two
  * languages in a shared embedding space), score every candidate pair by
  * the RATIO MARGIN — its cosine relative to the mean cosine of each
  * side's k nearest neighbors —
  *
  *   margin(x, y) = 2·cos(x, y) / (meanK(x → B) + meanK(y → A))
  *
  * and keep pairs that are MUTUAL best: x's top candidate is y and y's
  * top candidate is x. The margin denominator normalizes away embedding
  * "hubs" (vectors close to everything) that raw-cosine mining mistakes
  * for translations of everything.
  *
  * Engine-exact arithmetic: each cosine rounds at 8 decimals into
  * DECIMAL(18,8); the k-NN mean is the exact decimal top-k sum divided
  * (in double) by the actual neighbor count and re-rounded at 8; the
  * margin is one double division of those exact inputs, rounded at 6.
  * Rankings order by (rounded value desc, id) so every tie breaks the
  * same way in any engine.
  *
  * Scale shape: this kernel is written for one BLOCK — bounded slices of
  * the two corpora (an audit block, or one IVF-cell pair in the sharded
  * production layout where each side is cell-bucketed by the shared
  * quantizer and mining runs cell-by-cell). Within a block the smaller
  * side BROADCASTS, so the pair scoring is one map-side pass over the
  * larger side; the top-k/means/mutual-best steps shuffle only
  * (block-bounded) candidate rows, never a corpus.
  */
object BitextMine {

  /** Mutual-best margin pairs between two embedding sides:
    * (id_a, id_b, cosine, margin). One block: side B broadcasts. */
  def minePairs(sideA: DataFrame, sideB: DataFrame, id: Column,
                emb: Column, k: Int = 4): DataFrame = {
    val a = sideA.select(id.as("id_a"), emb.as("emb_a"))
    val b = sideB.select(id.as("id_b"), emb.as("emb_b"))
    marginMutualBest(score(a.join(broadcast(b))), k, hintBroadcast = true)
  }

  /** The corpus-scale path: both sides are assigned a BLOCK (an IVF
    * cell of a quantizer trained on their union — the same coarse
    * geometry the ANN lanes probe), candidate pairs form only WITHIN a
    * block (one shuffle join on the cell id, never all-pairs), and
    * margins/k-NN means/mutual-best all evaluate block-locally (each
    * vector's candidates are exactly its block, so the downstream
    * algebra is unchanged). Misses only cross-cell pairs — the same
    * recall trade the IVF ANN lane makes, measured in SCALE.md. */
  def minePairsBlocked(sideA: DataFrame, sideB: DataFrame, id: Column,
                       emb: Column, block: Column, k: Int = 4): DataFrame = {
    val a = sideA.select(id.as("id_a"), emb.as("emb_a"), block.as("blk"))
    val b = sideB.select(id.as("id_b"), emb.as("emb_b"), block.as("blk"))
    // per-vector mean tables are corpus-sized here — no broadcast hint;
    // the margins join shuffles on the id key like any fact join
    marginMutualBest(score(a.join(b, Seq("blk"))), k, hintBroadcast = false)
  }

  private def score(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a"), col("id_b"),
      round(graft.functions.VectorFns.cosine(col("emb_a"), col("emb_b")), 8)
        .cast(DecimalType(18, 8)).as("cos"))

  private def marginMutualBest(scored: DataFrame, k: Int,
                               hintBroadcast: Boolean): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame =
      if (hintBroadcast) broadcast(df) else df
    // mean of each side's k nearest cosines (rank by rounded cosine,
    // partner-id tiebreak); re-rounded at 8 after the double division
    def knnMean(keyCol: String, rankBy: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("cos").desc, col(rankBy))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .groupBy(col(keyCol))
        .agg(round(sum(col("cos")).cast(DoubleType) / count(lit(1)), 8)
          .as(out))
    }
    val mA = knnMean("id_a", "id_b", "mean_a")
    val mB = knnMean("id_b", "id_a", "mean_b")
    val margins = scored
      .join(maybeBcast(mA), Seq("id_a"))
      .join(maybeBcast(mB), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("cos"),
        round(lit(2.0) * col("cos").cast(DoubleType) /
          (col("mean_a") + col("mean_b")), 6).as("margin"))
    val bestForA = Window.partitionBy(col("id_a"))
      .orderBy(col("margin").desc, col("id_b"))
    val bestForB = Window.partitionBy(col("id_b"))
      .orderBy(col("margin").desc, col("id_a"))
    margins
      .withColumn("ra", row_number().over(bestForA))
      .withColumn("rb", row_number().over(bestForB))
      .filter(col("ra") === 1 && col("rb") === 1)
      .select(col("id_a"), col("id_b"),
        col("cos").cast(DoubleType).as("cosine"), col("margin"))
  }
}
