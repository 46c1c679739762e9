package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
  * J. Algorithms 2005 — public), expressed as plain relational ops so
  * Catalyst runs it with map-side combine:
  *
  *   - the sketch is d hash rows × w counters: each input row
  *     increments counter (i, h_i(key)) for i < d. As a DataFrame this
  *     is explode(d) → groupBy(i, bucket) → count — a PARTIAL-aggregable
  *     shuffle whose reduce side is at most d·w rows, REGARDLESS of key
  *     cardinality. That bounded state is the whole point at 100 TB:
  *     exact per-key counting shuffles the key universe, the sketch
  *     shuffles d·w counters.
  *   - estimate(k) = min_i sketch[i][h_i(k)] — overestimates only
  *     (collisions add, never subtract), within eps·N with probability
  *     1-delta for w = e/eps, d = ln(1/delta).
  *
  * The hashes are seeded 2-universal integer functions
  * h_i(k) = ((a_i·k + b_i) mod p) mod w with p = 2³¹-1 and a_i, b_i
  * fixed literals < 2³¹: all arithmetic stays below 2⁶² so it is exact
  * in 64-bit integers in ANY engine — which is what lets the DuckDB
  * oracle replay the sketch bit-for-bit (the hyperplane-replay recipe)
  * and hash-check an approximate estimator exactly. */
object CountMin {

  val P: Long = (1L << 31) - 1 // Mersenne prime 2^31-1
  /** Seeded odd multipliers/offsets (fixed literals — the determinism
    * contract; change them and the sketch changes everywhere incl. the
    * oracle). */
  val Seeds: Seq[(Long, Long)] =
    Seq((1234567891L, 987654321L), (987654323L, 123456789L),
        (7654321237L % P, 192837465L))

  // key reduced mod P FIRST: a·(x mod P) ≡ a·x (mod P) — identical
  // bucket, but no 64-bit overflow for keys ≥ 2³² (ANSI Spark throws;
  // ScaleGen-scale ids exceed 2³³)
  private def bucket(key: Column, a: Long, b: Long, width: Int): Column =
    ((lit(a) * (key % lit(P)) + lit(b)) % lit(P)) % lit(width)

  /** The sketch table (row, bucket, cnt) for a LONG key column —
    * d = Seeds.size rows, `width` counters each; at most d·width output
    * rows from one partial-aggregable pass. */
  def sketch(df: DataFrame, key: Column, width: Int): DataFrame = {
    val rows = Seeds.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), bucket(key, a, b, width).as("bucket"))
    }
    df.select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join SIZE estimate from two sketches — the AMS/CMS
    * inner-product estimator (Alon–Matias–Szegedy, STOC'96; CMS form in
    * Cormode & Muthukrishnan §4.3): |A ⋈ B| = Σ_k fA(k)·fB(k), and each
    * sketch row's Σ_b A_i[b]·B_i[b] OVERESTIMATES it (collisions only
    * add); min over the d rows tightens. This is the planner primitive
    * that prices a join BEFORE running it from two d·w-sized summaries —
    * at 100 TB the sketches are kilobytes where the join is the job.
    * All-integer arithmetic → replayable bit-for-bit. */
  def joinSizeEstimate(a: DataFrame, aKey: Column, b: DataFrame,
                       bKey: Column, width: Int): DataFrame = {
    val sa = sketch(a, aKey, width)
    val sb = sketch(b, bKey, width)
      .withColumnRenamed("cnt", "cnt_b")
    sa.join(sb, Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("cnt") * col("cnt_b")).as("inner"))
      .agg(min(col("inner")).as("est_join_size"))
  }

  /** Point estimates for every distinct key: min over the d rows of the
    * key's counters. The sketch side is d·width rows — broadcast into
    * the probe join, so the keys table never shuffles. */
  def estimates(df: DataFrame, key: Column, width: Int): DataFrame =
    estimatesFrom(sketch(df, key, width), df.select(key.as("key")).distinct(),
      width)

  /** [[estimates]] from an ALREADY-BUILT sketch table (row, bucket,
    * cnt) — the production read path when the sketch is MAINTAINED
    * (nightly batch build, or the streaming twin's carried state) and
    * estimation must not rescan the data it summarizes. `keys` is the
    * (key)-column probe set. The streaming parity spec pins that a
    * sketch carried across micro-batches estimates identically through
    * this path. */
  def estimatesFrom(sk: DataFrame, keys: DataFrame, width: Int): DataFrame = {
    val probes = Seeds.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), bucket(col("key"), a, b, width).as("bucket"))
    }
    keys.select(col("key"), explode(array(probes: _*)).as("rb"))
      .select(col("key"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sk), Seq("row", "bucket"))
      .groupBy(col("key"))
      .agg(min(col("cnt")).as("est_count"))
  }
}
