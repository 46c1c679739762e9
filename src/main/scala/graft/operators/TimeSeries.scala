package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: fill the missing time buckets of each
  * key's series (feature pipelines need one row per (key, bucket) even
  * when nothing happened) and carry the last observation forward.
  *
  * Scale shape: the observed series aggregates map-side-partially on
  * (key, bucket); each key's bucket range materializes ROW-LOCALLY from
  * its own min/max (explode of a bounded sequence — never a cross join
  * against a global calendar); the fill join and the carry-forward
  * window both ride one shuffle on the key. A key's series length
  * bounds its explode, so skew follows the data's own time span.
  */
object TimeSeries {

  /** One row per (key, bucket) between each key's first and last
    * observed bucket: `n_events` (0 where nothing happened) and
    * `filled` = the last non-null aggregate value at or before the
    * bucket (carry-forward). `bucketSeconds` sizes the grid. */
  def gapFill(events: DataFrame, key: Column, ts: Column, value: Column,
              bucketSeconds: Long): DataFrame = {
    val observed = events
      .select(key.as("k"), (floor(unix_timestamp(ts) / bucketSeconds) *
        bucketSeconds).cast("long").as("bucket"), value.as("v"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("bucket_value"))
    val spans = observed.groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
    val grid = spans.select(col("k"),
      explode(sequence(col("b0"), col("b1"), lit(bucketSeconds))).as("bucket"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("bucket_value"), ignoreNulls = true).over(w).as("filled"))
  }
}
