package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) table layout for co-located fact-fact joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both sides
  * on the join key. Writing both tables bucketed (and sorted) by that key
  * lets Spark's planner prove the partitioning requirement is already met:
  * the sort-merge join runs with NO Exchange on either side — each task
  * reads matching bucket files directly. This is the batch analogue of the
  * reference's date-partitioned layout, applied to join keys instead of
  * scan pruning. Verified by BucketingSpec (asserts the Exchange-free plan).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. `buckets` should be
    * sized so each bucket's largest partition fits an executor's memory at
    * the target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket per
    * table — split further by the date partition columns). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count —
    * planner elides both shuffles. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
