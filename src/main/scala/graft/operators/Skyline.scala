package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-dimensional skyline (Pareto frontier) — the "best tradeoff"
  * operator: keep every row not DOMINATED by another (dominated = some
  * other row is at-least-as-good on both dimensions and strictly better
  * on one). Börzsönyi et al., "The Skyline Operator", ICDE 2001 (public).
  *
  * Scale shape for the monotone 2-D case (minimize `cost`, maximize
  * `benefit`): dominance only depends on the per-benefit-level cost
  * minimum, so
  *
  *  1. one corpus-wide agg: min(cost) per distinct benefit level — the
  *     only full-data shuffle, output bounded by |distinct benefit|;
  *  2. a running min over STRICTLY greater benefit levels — a window
  *     over the tiny per-level agg (|distinct levels| rows on one task
  *     by design: for continuous benefit domains swap in a range-
  *     partitioned prefix-scan; the level table, not the corpus, is
  *     what's sorted);
  *  3. broadcast the per-level thresholds back and filter map-side:
  *     a row survives iff it is the cheapest at its own benefit level
  *     AND no strictly-better level is at-or-below its cost.
  *
  * Equal (cost, benefit) duplicates survive together — neither strictly
  * dominates. The naive formulation is an O(n²) NOT EXISTS self-join
  * (exactly what the DuckDB oracle replays); this shape is one shuffle +
  * one broadcast at any corpus size. */
object Skyline {

  /** Pareto frontier minimizing `cost`, maximizing `benefit`. Returns
    * the input columns of surviving rows. */
  def frontier2d(df: DataFrame, cost: Column, benefit: Column): DataFrame = {
    val tagged = df.withColumn("__cost", cost).withColumn("__benefit", benefit)
    val byLevel = tagged.groupBy(col("__benefit"))
      .agg(min(col("__cost")).as("__min_cost"))
    // running min over strictly-greater benefit rows of the LEVEL table
    val w = Window.orderBy(col("__benefit").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val th = byLevel.withColumn("__min_gt", min(col("__min_cost")).over(w))
    tagged
      .join(broadcast(th), Seq("__benefit"))
      .filter(col("__cost") === col("__min_cost") &&
        (col("__min_gt").isNull || col("__min_gt") > col("__cost")))
      .drop("__cost", "__benefit", "__min_cost", "__min_gt")
  }
}
