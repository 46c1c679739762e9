package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: connected components over a pair list, by
  * iterative minimum-label propagation.
  *
  * Input: undirected edges (id_a, id_b) from any of the Dedup candidate
  * generators. Output: (doc_id, cluster_id) where cluster_id is the
  * smallest doc id reachable through near-duplicate links — the canonical
  * representative to keep.
  *
  * Scale notes: each iteration is one groupBy shuffle on the doc id;
  * iteration count is the graph diameter, and near-dup graphs are
  * overwhelmingly tiny cliques (diameter ~1-2), so `maxIter` of a few
  * converges in practice. Each iteration's result is persisted and the
  * previous one released — no lineage blow-up. This is the standard
  * large-graph CC shape (Hash-Min); for adversarial diameters swap in
  * large-star/small-star, which keeps the same per-iteration shuffle.
  */
object DedupClusters {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Labels plus convergence telemetry: `iterations` actually run, and
    * whether the labels were VERIFIED stable (an iteration completed with
    * no label change) before `maxIter` cut the loop. An unconverged
    * result is still a valid partial clustering — every label is some
    * reachable doc id — but long chains may not have collapsed to their
    * global minimum yet. */
  final case class ClusteringResult(labels: DataFrame, iterations: Int,
                                    converged: Boolean)

  def clusters(pairs: DataFrame, idA: Column, idB: Column,
               maxIter: Int = 5): DataFrame = {
    val r = clustersWithStats(pairs, idA, idB, maxIter)
    if (!r.converged) {
      log.warn(s"DedupClusters: label propagation hit maxIter=$maxIter " +
        s"before verified convergence — long duplicate chains may carry " +
        s"non-canonical labels. Raise maxIter (diameter-bound) or use " +
        s"large-star/small-star for adversarial-diameter graphs.")
    }
    r.labels
  }

  def clustersWithStats(pairs: DataFrame, idA: Column, idB: Column,
                        maxIter: Int = 5): ClusteringResult = {
    val edges = pairs.select(idA.as("src"), idB.as("dst"))
    // symmetrize + self-loops so isolated link members keep themselves
    val sym = edges
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(edges.select(col("src"), col("src").as("dst")))
      .unionAll(edges.select(col("dst").as("src"), col("dst").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sym.count()

    // label(v) starts as v, then repeatedly takes the min label among
    // neighbors (including itself, via the self-loop)
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Hash-Min labels only ever decrease, so an unchanged label SUM is an
    // exact convergence test — one cheap aggregate per round, no join.
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("label"))).collect().head.getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val next = sym
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    sym.unpersist()
    ClusteringResult(
      labels.select(col("id").as("doc_id"), col("label").as("cluster_id")),
      iterations = iter, converged = converged)
  }

  /** One row per cluster: representative, member count, member list
    * (member list capped — at corpus scale use the exploded form). */
  def clusterSummary(clustered: DataFrame): DataFrame =
    clustered.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sort_array(collect_list(col("doc_id"))).as("members"))
}
