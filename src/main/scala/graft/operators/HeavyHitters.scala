package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Heavy hitters over an unbounded item domain in O(k) memory: the
  * sketch-then-recount pattern.
  *
  * Pass 1 aggregates a Misra–Gries summary (graft.plans.MisraGries):
  * map-side partials of ≤ k counters merge associatively, so the sketch
  * costs one tiny aggregation no matter how many distinct items exist —
  * unlike an exact groupBy, whose hash tables grow with the vocabulary.
  * MG guarantees no item with true frequency > n/(k+1) is ever lost, so
  * with support > 1/(k+1) the ≤ k candidates contain every true heavy
  * hitter. Pass 2 recounts ONLY the candidates exactly (broadcast
  * candidate filter → the scan drops non-candidates map-side, the
  * groupBy shuffles ≤ k keys) and applies the support threshold.
  *
  * The final output is therefore EXACT and independent of partitioning
  * (the sketch contents vary with partition order; the recounted,
  * thresholded set does not) — which is what makes it verifiable against
  * a plain exact-count oracle while using bounded memory.
  */
object HeavyHitters {

  /** Items with frequency >= support (exact counts), via MG candidates.
    * `support` must exceed 1/(k+1) for the no-false-negative guarantee. */
  def approx(items: DataFrame, itemCol: Column, support: Double,
             k: Int = 256): DataFrame = {
    require(support > 1.0 / (k + 1),
      s"support $support must exceed 1/(k+1) = ${1.0 / (k + 1)} for exactness")
    val toks = items.select(itemCol.as("token"))
    // ONE aggregation yields both the candidate sketch and n, so pass 1 is
    // a single scan; a separate count() would re-scan the full stream
    val cands = toks
      .agg(count(lit(1)).cast(DoubleType).as("total"),
        graft.plans.MisraGries.sketch(col("token"), k).as("sk"))
      .select(col("total"), explode(col("sk")).as("c"))
      .select(col("c.item").as("token"), col("total"))
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("total")).as("total"))
      .filter(col("cnt") >= col("total") * support)
      .select(col("token"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("support"))
  }
}
