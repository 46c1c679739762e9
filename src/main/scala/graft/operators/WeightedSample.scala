package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic weighted sampling without replacement — the
  * Efraimidis–Spirakis scheme with hash-derived randomness.
  *
  * Each row gets u ∈ (0,1) from the md5 of its id (reproducible across
  * runs, partitionings and engines — the same keyed-randomness convention
  * as Sampling.trainValTest) and priority -ln(u)/w; the k smallest
  * priorities are the weighted sample. Equivalent to ranking by u^(1/w),
  * numerically tamer. Priorities are ROUNDED before ranking (with an id
  * tie-break) so the cross-engine oracle ranks identically in the face of
  * last-ulp libm differences.
  *
  * Scale shape: priority is row-local inside the scan; the top-k is the
  * bounded TopKPerGroup / TakeOrderedAndProject pattern — no global sort
  * of the corpus, no driver-side randomness.
  */
object WeightedSample {

  /** u ∈ (0,1) from the first 8 md5 hex chars of `id` (never exactly 0:
    * the +1 offset keeps ln defined). */
  def hashUniform(id: Column): Column =
    (conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10).cast(DoubleType) + 1.0) /
      4294967297.0 // 2^32 + 1

  /** Efraimidis–Spirakis priority: -ln(u)/w, rounded for cross-engine
    * rank stability. Smaller = more likely to be kept. */
  def priority(id: Column, weight: Column, scale: Int = 9): Column =
    round(-log(hashUniform(id)) / weight.cast(DoubleType), scale)

  /** The k-row weighted sample (without replacement): rows with the
    * smallest priorities, deterministic under re-runs. orderBy+limit
    * plans as TakeOrderedAndProject — per-partition bounded top-k then a
    * k-row merge, never a global sort; only the k survivors see the
    * (single-partition, k-row) ranking window. */
  def sample(df: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    val withP = df.withColumn("priority", priority(id, weight))
    val topk = withP.orderBy(col("priority").asc, id.asc).limit(k)
    // Unpartitioned BY DESIGN: only the k survivors of the bounded top-k
    // reach this window (PlanSpec pins the window-above-limit shape), so
    // the single partition WindowExec warns about holds k rows, not the
    // corpus. A constant partition key would silence the warning but
    // Catalyst folds foldable partition expressions away (verified on
    // 4.1: the spec comes out empty either way) — the harnesses filter
    // the WindowExec logger instead (graft.Logs.quietKnownNoise).
    val w = Window.orderBy(col("priority").asc, id.asc)
    topk.withColumn("sample_rank", row_number().over(w).cast(LongType))
  }

  /** Per-group variant: k rows per group — the weighted counterpart of
    * Sampling.perGroupSample; rewrites to TopKPerGroup when
    * GraftExtensions is installed. */
  def sampleByGroup(df: DataFrame, group: Column, id: Column,
                    weight: Column, k: Int): DataFrame = {
    val withP = df.withColumn("priority", priority(id, weight))
    val w = Window.partitionBy(group).orderBy(col("priority").asc, id.asc)
    withP.withColumn("sample_rank", row_number().over(w).cast(LongType))
      .filter(col("sample_rank") <= k)
  }
}
