package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval (range) join via time binning.
  *
  * Spark plans `l.ts BETWEEN r.start AND r.end` (plus optional equi
  * keys) as a BroadcastNestedLoopJoin — a per-row interval probe that
  * dies at scale. Binning restores a shuffle hash join: each interval
  * EXPLODES to every fixed-width time bin it covers, each point maps to
  * exactly ONE bin, and the join becomes equi on (keys…, bin) followed
  * by the exact range filter. Because a point has a single bin, every
  * qualifying (point, interval) pair matches exactly once — no dedup.
  *
  * Pick `binSeconds` near the typical interval length: the interval
  * side replicates by ceil(len/bin)+1 rows (its shuffle cost), while a
  * too-large bin widens each bucket (more filtered pairs). Skewed hot
  * bins behave like any skewed join key — AQE skew handling applies. */
object RangeJoin {

  /** Inner join of `points` rows to every `intervals` row of the same
    * `keys` whose [startTs, endTs) half-open window contains pointTs.
    * Output: all point columns + the interval's columns except its keys. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointTs: String,
                      startTs: String, endTs: String,
                      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val p = points.withColumn("_bin",
      floor(unix_timestamp(col(pointTs)) / binSeconds).cast(LongType))
    val iv = intervals.withColumn("_bin", explode(sequence(
        floor(unix_timestamp(col(startTs)) / binSeconds).cast(LongType),
        floor(unix_timestamp(col(endTs)) / binSeconds).cast(LongType))))
    p.join(iv, keys :+ "_bin")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("_bin")
  }

  /** Interval-overlap join: pairs of (left, right) intervals on the same
    * `keys` whose half-open windows intersect (a.start < b.end AND
    * b.start < a.end) — session/session overlap, concurrency analysis,
    * conflict detection. Same binning idea as [[pointInInterval]], but
    * BOTH sides explode to their covered bins, so an overlapping pair
    * can co-occur in several bins: the pair is kept only in the FIRST
    * bin both cover (max of the two start bins) — an arithmetic guard,
    * cheaper than a distinct over the matched pairs. Column names of
    * the two interval sets must be disjoint apart from `keys`. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame =
      df.withColumn(s"_b0_$tag",
          floor(unix_timestamp(col(s)) / binSeconds).cast(LongType))
        .withColumn("_bin", explode(sequence(col(s"_b0_$tag"),
          floor(unix_timestamp(col(e)) / binSeconds).cast(LongType))))
    binned(left, leftStart, leftEnd, "l")
      .join(binned(right, rightStart, rightEnd, "r"), keys :+ "_bin")
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("_bin") === greatest(col("_b0_l"), col("_b0_r")))
      .drop("_bin", "_b0_l", "_b0_r")
  }
}
