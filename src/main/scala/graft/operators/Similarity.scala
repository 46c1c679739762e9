package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two rungs:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is broadcast, so the candidate scan is a single
  *    map-side pass (no shuffle of the 100 TB candidate set); the only
  *    shuffle is the tiny per-query top-k.
  *  - [[lshTopK]]: random-hyperplane LSH — candidates are restricted to
  *    the query's sign-bucket, turning the scan into a bucket-local join.
  *    Planes are deterministic (seeded), so bucketing is reproducible and
  *    can be precomputed + bucket-partitioned as a materialized index.
  *
  * All pair scoring goes through the one-pass codegen cosine
  * (graft.plans.CosineSimilarity) — dot and both norms in a single
  * primitive loop, no interpreted higher-order functions on the hot path.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector by cosine similarity.
    * Ties broken by candidate id for determinism. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        VectorFns.cosine6(col("q_emb"), col("c_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `planes` × `dim`, components from a
    * seeded java.util.Random (platform-stable LCG). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Dot product against a constant plane (array literal → single fold). */
  private def dotLit(emb: Column, plane: Array[Double]): Column =
    aggregate(zip_with(emb, typedlit(plane.toSeq), (x, w) => x.cast(DoubleType) * w),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-pattern bucket id of a vector under the given hyperplanes. */
  def bucketOf(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotLit(emb, p) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k via multi-probe hyperplane LSH: each query searches its own
    * sign-bucket plus every bucket within Hamming distance `probeRadius`
    * (flipping 1–2 sign bits). Multi-probe trades a small constant probe
    * fan-out for the recall that single-probe loses on weakly-correlated
    * vectors — without adding more hash tables (i.e. without re-bucketing
    * the 100 TB candidate side, which stays partitioned by one bucket id). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64, probeRadius: Int = 1): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val flips: Seq[Column] = {
      val base = Seq(col("bucket"))
      val one = if (probeRadius >= 1)
        (0 until nPlanes).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
      else Nil
      val two = if (probeRadius >= 2)
        (for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes } yield
          col("bucket").bitwiseXOR(lit((1L << i) | (1L << j))))
      else Nil
      base ++ one ++ two
    }
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        bucketOf(col("embedding"), planes).as("bucket"))
      .withColumn("bucket", explode(array(flips: _*)))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      bucketOf(col("embedding"), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        VectorFns.cosine6(col("q_emb"), col("c_emb")).as("cosine"))
      .distinct() // a pair can surface through several probes
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs (id_a < id_b, cosine >= threshold)
    * over an id-sampled subset — the exact-verification shape used by the
    * embedding-dedup path. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
                         sampleMod: Int = 1): DataFrame = {
    val v = vectors.filter(col("vec_id") % sampleMod === 0)
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFns.cosine6(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
