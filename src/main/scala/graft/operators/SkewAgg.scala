package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase (salted) aggregation.
  *
  * For heavy-hitter grouping keys the single-shuffle groupBy sends every
  * row of a hot key to one reducer. Salting splits each key into
  * `saltBuckets` deterministic sub-keys, pre-aggregates, then combines —
  * two small shuffles instead of one skewed one. (Spark's AQE skew-join
  * handling covers joins; this covers aggregations.)
  *
  * The salt is a hash of a high-cardinality column, not a random number —
  * results stay deterministic and re-runnable. */
object SkewAgg {

  /** sum(valueCol) grouped by `keys`, computed via salted two-phase agg.
    * `saltSource` must be a column (or tuple) with per-row variation. */
  def saltedSum(df: DataFrame, keys: Seq[Column], valueCol: Column,
                saltSource: Column, resultName: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_partial"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("_partial")).as(resultName))
  }
}
