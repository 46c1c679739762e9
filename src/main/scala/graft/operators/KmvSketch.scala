package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** KMV ("k minimum values") distinct sketch (Bar-Yossef et al.,
  * RANDOM 2002; the theta-sketch family's bottom-k form — public), the
  * mergeable distinct estimator that ALSO answers set-operation
  * questions HLL cannot: intersections between groups come straight
  * from the sketches.
  *
  * The sketch of a set is the k smallest DISTINCT values of a uniform
  * hash of its members — bounded at k values per group no matter the
  * cardinality. Estimate: the k-th minimum h_k divides the hash range
  * [0, P) into k spans of mean width h_k/k, so n ≈ (k-1)·P/h_k.
  * Merging is union-then-keep-k-smallest (associative, lossless);
  * the k smallest of a union of per-split sketches ARE the k smallest
  * of the union of the splits, which is what makes the per-group build
  * below a bounded TopKPerGroup rather than a key-universe shuffle.
  *
  * Intersection (the theta-sketch trick): the combined sketch of A∪B is
  * the k smallest of the two sketches' union; below its k-th min θ,
  * sketch membership is set membership (θ never exceeds either side's
  * own k-th min), so the fraction ρ of combined-sketch values present
  * in BOTH sketches is a Jaccard estimate and |A∩B| ≈ ρ·|A∪B|.
  *
  * Like graft's Count-Min (CountMin.scala), the hash is a seeded
  * 2-universal integer map h(x) = (a·x + b) mod P with P = 2³¹−1 and
  * a, b fixed literals < 2³¹: every intermediate stays under 2⁶², so
  * the whole estimator replays BIT-FOR-BIT in any engine with 64-bit
  * integers — the DuckDB oracle hash-checks an approximate estimator
  * exactly.
  *
  * Reference framing: the reference's auditing/aggregation jobs count
  * distincts per partition (etl_job_auditor aggregates per-run stats);
  * at 100 TB those exact distincts become per-day KMV sketch rows that
  * merge across any date range and intersect across segments. */
object KmvSketch {

  val P: Long = (1L << 31) - 1 // Mersenne prime, same modulus as CountMin
  /** Fixed hash seeds (the determinism contract — the oracle replays
    * these literals). */
  val A: Long = 1203248987L
  val B: Long = 417204511L

  /** The hash — exact in 64-bit arithmetic for ANY non-negative long
    * key: the key is reduced mod P FIRST (a·(x mod P) ≡ a·x (mod P), so
    * this is the identical hash value), keeping every intermediate under
    * 2⁶² where a·x itself would overflow for keys ≥ 2³² (ANSI Spark
    * throws on long overflow — found at 100× scale where ScaleGen's
    * key stride pushes ids past 2³³). */
  def hv(key: Column): Column = (lit(A) * (key % lit(P)) + lit(B)) % lit(P)

  /** Per-group sketch: the k smallest distinct hash values, as rows
    * (g, hv, rk). The rn<=k shape rewrites to the bounded TopKPerGroup
    * heaps (install GraftExtensions), so the build is one distinct
    * shuffle + bounded per-partition state — never a full per-group
    * sort. */
  def sketch(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    val h = df.select(group.as("g"), hv(key).as("hv")).distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("hv"))
    h.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
  }

  /** (k−1)·P / θ as a double — both engines divide the SAME exact
    * integers, so the quotient is bit-identical. */
  private def estFromTheta(theta: Column, k: Int): Column =
    lit((k - 1).toLong * P).cast(DoubleType) / theta

  /** Per-group distinct estimates: (g, sketch_size, kth_hash,
    * est_distinct). A group with fewer than k distinct members is held
    * in full — its estimate is exact by construction. */
  def estimates(sk: DataFrame, k: Int): DataFrame =
    sk.groupBy(col("g"))
      .agg(count(lit(1)).as("sketch_size"), max(col("hv")).as("kth_hash"))
      .select(col("g"), col("sketch_size"), col("kth_hash"),
        when(col("sketch_size") < k, col("sketch_size").cast(DoubleType))
          .otherwise(round(estFromTheta(col("kth_hash"), k), 4))
          .as("est_distinct"))

  /** All-pairs (ga < gb) union + intersection estimates from the
    * sketches alone: (ga, gb, combined_size, theta, n_common,
    * est_union, est_inter). Everything past the sketch build touches
    * ≤ k·|groups| rows. */
  def intersectEstimates(sk: DataFrame, k: Int): DataFrame = {
    val groups = sk.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    // membership-flagged union of the two sketches' values
    val comb = sk.join(broadcast(pairs),
        col("g") === col("ga") || col("g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("hv"))
      .agg(max(col("g") === col("ga")).as("in_a"),
        max(col("g") === col("gb")).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("hv"))
    val kmin = comb.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
    val st = kmin.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("combined_size"), max(col("hv")).as("theta"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
          .as("n_common"))
    // combined_size < k ⇒ the union was enumerated in full: exact path.
    st.select(col("ga"), col("gb"), col("combined_size"), col("theta"),
      col("n_common"),
      when(col("combined_size") < k, col("combined_size").cast(DoubleType))
        .otherwise(round(estFromTheta(col("theta"), k), 4)).as("est_union"),
      when(col("combined_size") < k, col("n_common").cast(DoubleType))
        .otherwise(round(
          col("n_common") * estFromTheta(col("theta"), k) / lit(k), 4))
        .as("est_inter"))
  }
}
