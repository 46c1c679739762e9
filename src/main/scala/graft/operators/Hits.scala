package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HITS (hubs & authorities; Kleinberg 1999) over a directed edge set —
  * the BIPARTITE ranking the PageRank family lacks: PageRank scores one
  * homogeneous node set, HITS scores the two SIDES of a directed
  * relation against each other (customers that buy widely = hubs;
  * parts bought by good hubs = authorities — the query/document,
  * buyer/product, citer/cited shape).
  *
  * Determinism/parity: scores live on a round-8 DECIMAL(18,8) grid.
  * Each half-step is sum-of-decimals (exact, order-independent)
  * followed by ONE double division for the L1 renormalization, rounded
  * back to the grid — so a recursive-free SQL oracle (one CTE per
  * half-step) replays every iteration bit-for-bit, the same convention
  * as the unrolled PageRank/label-propagation oracles.
  *
  * Scale shape: each half-step is one edge-linear equi-join + one
  * key-partitioned sum + a 1-row broadcast total — no all-pairs, no
  * driver-side state; iterations multiply cost linearly, exactly like
  * the PageRank lane. L1 (not the classical L2) normalization keeps
  * the arithmetic in the exact-decimal discipline (sqrt would force
  * engine-ordered float sums); rankings are identical under any
  * positive rescaling, which is all HITS' fixed point defines. */
object Hits {

  /** L1-renormalize a (key, s DECIMAL) score table onto the round-8
    * grid the next half-step consumes. */
  private def renorm(scores: DataFrame, key: String): DataFrame = {
    val tot = scores.agg(sum(col("s")).as("tot"))
    scores.crossJoin(broadcast(tot))
      .select(col(key),
        round(col("s").cast(DoubleType) / col("tot").cast(DoubleType), 8)
          .cast(DecimalType(18, 8)).as("s"))
  }

  /** `iters` full rounds of a ← Aᵀh, h ← A a (renormalized each
    * half-step) from h₀ = uniform over sources. Edges must be distinct
    * (src, dst) rows. Returns (side, node, score, degree): every dst
    * with its authority score and in-degree, every src with its hub
    * score and out-degree. */
  def scores(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"))
    var h = e.select(col("src")).distinct()
      .select(col("src"), lit(1).cast(DecimalType(18, 8)).as("s"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = renorm(
        e.join(h, "src").groupBy(col("dst")).agg(sum(col("s")).as("s")),
        "dst")
      h = renorm(
        e.join(a, "dst").groupBy(col("src")).agg(sum(col("s")).as("s")),
        "src")
    }
    val inDeg = e.groupBy(col("dst")).agg(count(lit(1)).as("degree"))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    a.join(inDeg, "dst")
      .select(lit("authority").as("side"), col("dst").as("node"),
        col("s").cast(DoubleType).as("score"), col("degree"))
      .unionByName(
        h.join(outDeg, "src")
          .select(lit("hub").as("side"), col("src").as("node"),
            col("s").cast(DoubleType).as("score"), col("degree")))
  }
}
