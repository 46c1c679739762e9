package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007), made deterministic and therefore oracle-replayable.
  *
  * Classic LPA is run asynchronously with random tie-breaks; that is
  * unreproducible by construction. This variant fixes both choices:
  *  - SYNCHRONOUS rounds: round t's labels are computed entirely from
  *    round t-1's (one join + one aggregation per round — the same
  *    edge-linear shuffle shape as the PageRank iteration; at index
  *    scale the adjacency would be pre-partitioned by src so the join
  *    is co-located).
  *  - deterministic adoption: each node takes the most frequent label
  *    among its neighbours, ties to the SMALLEST label (count DESC,
  *    label ASC — the same argmax convention the BPE trainer uses).
  *  - a FIXED round count instead of convergence detection: synchronous
  *    LPA can oscillate on bipartite structures, so "run to
  *    convergence" is ill-defined; a fixed horizon is how the
  *    at-scale implementations (GraphFrames LPA) ship it, and it is
  *    what lets a SQL oracle unroll the exact computation.
  *
  * The per-round argmax goes through row_number over (node) — rewritten
  * to the bounded TopKPerGroup operator by GraftExtensions — and each
  * round's labels are reliably checkpointed like the CC loop's
  * frontiers (operators.Ckpt; r15), so lineage stays flat however many
  * rounds run.
  */
object LabelProp {

  /** `rounds` synchronous LPA rounds over symmetric `edges` (src, dst).
    * Returns (node, label). Initial label = own id. */
  /** One synchronous adoption round: neighbour-label counts + the
    * deterministic argmax. Exposed so PlanSpec can pin the round's
    * physical shape (the loop checkpoints each round, which hides the
    * plan behind a Scan ExistingRDD). */
  private[graft] def adoptionRound(e: DataFrame, labels: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label"))
    e.join(labels.withColumnRenamed("node", "dst"), "dst")
      .groupBy(col("src").as("node"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("node"), col("label"))
  }

  def propagate(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = OpCaches.track(edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var nLabels = 0L
    // bounded retention (Ckpt.Rotation): chain loop — generations
    // older than the newest two are unreachable and deleted as rounds
    // land, so long runs don't strand one parquet per round
    val rot = new Ckpt.Rotation()
    for (r <- 1 to rounds) {
      // parquet-round-trip truncation: each round materializes exactly
      // once onto reliable files, so the final labels never replay
      // against the released edge cache; node count is constant across
      // rounds, so round 1's metadata-only count sizes later writes
      labels = rot.next(adoptionRound(e, labels),
        if (r == 1) 0 else Ckpt.partsFor(nLabels))
      if (r == 1) nLabels = labels.count()
    }
    OpCaches.untrack(e)
    e.unpersist(blocking = false)
    labels
  }

  /** Community summary: per final label, member count and id range. */
  def summary(edges: DataFrame, rounds: Int): DataFrame =
    propagate(edges, rounds)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("sz"),
        min(col("node")).as("min_node"), max(col("node")).as("max_node"))
}
