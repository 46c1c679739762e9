package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — classify every key across two versions of a
  * table as added / removed / changed / unchanged, the audit primitive
  * behind lake time travel ("what did last night's merge actually do?"),
  * reconciliation reports, and incremental-pipeline regression checks.
  * The reference's audit lambda records per-run row counts
  * (etl_job_auditor/lambda_handler.py); a diff is the row-level answer
  * those counts summarize.
  *
  * Shape: ONE full-outer equi-join on the key (both sides shuffle on the
  * key; with snapshots bucketed on it the join is co-located and
  * Exchange-free), classification map-side after the join via null-safe
  * payload comparison. No window, no second pass — at 100 TB the diff
  * costs exactly the join. */
object SnapshotDiff {

  /** @param before  older snapshot, unique per `keys`
    * @param after   newer snapshot, unique per `keys`
    * @param keys    join key column names
    * @param payload columns compared (null-safely) to decide `changed`;
    *                emitted as `<col>_before` / `<col>_after`. */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
           payload: Seq[String]): DataFrame = {
    val b = payload.foldLeft(before) { (d, c) => d.withColumnRenamed(c, s"${c}_before") }
      .withColumn("_in_before", lit(true))
    val a = payload.foldLeft(after) { (d, c) => d.withColumnRenamed(c, s"${c}_after") }
      .withColumn("_in_after", lit(true))
    val changed: Column = payload
      .map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keys, "full_outer")
      .withColumn("diff_class",
        when(col("_in_before").isNull, lit("added"))
          .when(col("_in_after").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("_in_before", "_in_after")
  }
}
