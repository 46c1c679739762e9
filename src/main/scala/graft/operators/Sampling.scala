package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * Training-data pipelines need splits that are (a) stable under
  * re-runs, repartitioning and cluster-size changes, (b) derivable from
  * the record's identity alone (no persisted split table to keep in
  * sync), and (c) reproducible OUTSIDE the engine for audits. Spark's
  * `sample()`/`randomSplit()` give none of these: they are seed+partition
  * dependent. Here each row hashes to a stable bucket via md5 of its
  * stringified key — md5 is identical in every engine (the q_train_test
  * _split oracle recomputes the exact assignment in DuckDB SQL).
  *
  * All pure Column expressions: bucketing runs inside the scan stage,
  * sampling is a pushable-adjacent filter, no shuffle. */
object Sampling {

  /** Stable bucket in [0, buckets): first 8 md5 hex chars of the
    * stringified key, as an integer, mod buckets. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % buckets

  /** Keep ~pct% of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Deterministic per-group sample: keep k rows per group, chosen by
    * md5-hash priority (a keyed reservoir without randomness — the
    * "cap documents per source/domain" curation op). With
    * GraftExtensions installed the row_number+filter rewrites to the
    * bounded TopKPerGroup operator, so no full per-group sort runs. */
  def perGroupSample(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(md5(key.cast(StringType)), key)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Assign 'test' / 'val' / 'train' split labels by stable hash bucket:
    * buckets [0, testPct) → test, [testPct, testPct+valPct) → val,
    * rest → train. */
  def trainValTest(df: DataFrame, key: Column,
                   valPct: Int = 10, testPct: Int = 10): DataFrame = {
    require(valPct + testPct < 100, "val + test must leave room for train")
    val b = hashBucket(key)
    df.withColumn("split",
      when(b < testPct, lit("test"))
        .when(b < testPct + valPct, lit("val"))
        .otherwise(lit("train")))
  }
}
