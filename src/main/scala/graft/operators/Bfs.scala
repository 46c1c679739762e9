package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search — minimum hop count from a seed
  * set, the reachability/distance primitive next to the component
  * (connectivity), PageRank (centrality), k-core (cohesion) and
  * triangle (clustering) lanes. Production shapes: "how far does a
  * recall/contamination set propagate through the co-occurrence
  * graph", influence radii, link-distance features.
  *
  * Scale shape (the CC/k-core discipline): each round expands the
  * CURRENT frontier only — one keyed join frontier⋈edges + one
  * anti-join against the settled set, all edge-linear keyed shuffles;
  * the frontier and settled sets are localCheckpoint'd per round so
  * round N's plan doesn't embed rounds 1..N−1. BFS settles each node
  * exactly once (the first time it's reached IS its minimum hop —
  * Dijkstra with unit weights), so total work across all rounds is
  * O(edges) regardless of round count, and the loop stops early the
  * moment a frontier comes back empty. */
object Bfs {

  /** Minimum hops from any seed over a SYMMETRIC (src, dst) edge list:
    * (node, hops), hops = 0 for seeds, settled nodes only (unreached
    * nodes are absent — at scale the unreached set is the corpus).
    * `maxHops` bounds the rounds; nodes further than it stay absent. */
  def minHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    var settled = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = settled
    var h = 1L
    var done = frontier.isEmpty
    while (h <= maxHops && !done) {
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hops"))
        .localCheckpoint(true)
      done = next.isEmpty
      if (!done) {
        val grown = settled.unionByName(next).localCheckpoint(true)
        settled.unpersist(blocking = false)
        frontier.unpersist(blocking = false)
        settled = grown
        frontier = next
      }
      h += 1
    }
    settled
  }
}
