package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting by degree-ordered edge orientation.
  *
  * The standard scalable algorithm (node-iterator++ / the MapReduce
  * formulation of Suri & Vassilvitskii's "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11): orient every undirected edge
  * from its (degree, id)-smaller endpoint to the larger one, build
  * wedges only from each node's ORIENTED out-neighbors, and close them
  * against oriented edges. Orientation bounds each node's out-degree by
  * O(√m), so wedge fan-out is O(m^1.5) worst-case instead of Σdeg² —
  * the hub that would explode an id-ordered wedge join (a part in every
  * basket → deg² wedges) contributes almost nothing because high-degree
  * endpoints sit on the receiving side.
  *
  * Everything is joins + integer counts — exactly replayable in SQL,
  * so the per-node triangle participation is hash-checked cross-engine.
  */
object Triangles {

  /** Per-node triangle participation over a symmetric distinct edge
    * list (both directions present, no self-loops).
    *
    * `batches` bounds the LIVE shuffle footprint, not the total work:
    * wedge volume is Σ C(outdeg⁺, 2) regardless (measured 41M per
    * sf0.1-replica of the co-purchase graph → ~4.1B wedges / ~100 GB
    * closing shuffle at 100× bench scale — trivial spread over a
    * cluster, but over one machine's free disk it's fatal). With
    * batches = K, wedge generation is split by hash(u) and each slice
    * is closed and reduced to per-node counts EAGERLY (localCheckpoint
    * severs lineage, so the slice's shuffle files become collectible
    * before the next slice runs); peak disk is ~1/K of the monolithic
    * plan at the cost of K passes over the (persisted) oriented edges.
    * batches = 1 is the plain single-job plan. Results are identical
    * for any K (TrianglesSpec pins it). */
  def perNode(und: DataFrame, batches: Int = 1): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // keep one direction per undirected edge: (deg, id)-smaller → larger
    val oriented0 = und
      .join(deg.select(col("src"), col("d").as("du")), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("dv")), "dst")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("src") < col("dst")))
      .select(col("src").as("u"), col("dst").as("v"), col("dv"))
    val oriented = if (batches > 1)
      OpCaches.track(oriented0.persist(StorageLevel.MEMORY_AND_DISK))
    else oriented0

    def closeSlice(slice: DataFrame): DataFrame = {
      // wedges (u; v ≺ w) from u's oriented out-neighbors, closed by
      // the oriented edge v→w (≺ is the orientation's (deg, id) order)
      val wedges = slice.select(col("u"), col("v"), col("dv"))
        .join(slice.select(col("u"), col("v").as("w"), col("dv").as("dw")),
          Seq("u"))
        .filter(col("dv") < col("dw") ||
          (col("dv") === col("dw") && col("v") < col("w")))
        .select(col("u"), col("v"), col("w"))
      val tris = wedges.join(
        oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("c"))
    }

    if (batches <= 1) closeSlice(oriented0)
      .select(col("node"), col("c").as("n_triangles"))
    else {
      val parts = (0 until batches).map { k =>
        val slice = closeSlice(oriented.filter(
            pmod(xxhash64(col("u")), lit(batches)) === k))
        // parquet-round-trip truncation severs lineage to the slice
        // shuffles onto DISK files (Ckpt, r15 — evicted localCheckpoint
        // blocks are unrecomputable; per-node count frames are tiny)
        val t = Ckpt.viaParquet(slice)
        // unregister the slice's wedge shuffles DETERMINISTICALLY so
        // disk frees before the next slice starts writing (the whole
        // point of batching) — no GC/weak-ref timing involved:
        // cleanShuffleDependencies (SPARK-31756) walks the severed
        // plan's ancestry and stops at any persisted RDD, so the cached
        // oriented edge list and its upstream shuffle survive while the
        // slice-local wedge/close shuffle files are removed now
        slice.queryExecution.toRdd.cleanShuffleDependencies(blocking = true)
        t
      }
      parts.reduce(_ unionAll _)
        .groupBy(col("node"))
        .agg(sum(col("c")).as("n_triangles"))
    }
  }
}
