package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge — apply a keyed changelog to a base snapshot, the batch
  * MERGE INTO primitive that sits between Compaction.latestByKey (which
  * collapses a changelog alone) and Scd2.history (which keeps versions):
  *
  *  - the changelog is first collapsed to ONE latest change per key
  *    (version-ordered row_number = 1 — the shape graft's optimizer
  *    rewrites to the bounded TopKPerGroup operator);
  *  - a full outer join on the key then reconciles: delete ops drop the
  *    base row, any other op replaces it with the change's row image
  *    (full-row CDC convention), unmatched change keys INSERT, unmatched
  *    base keys pass through.
  *
  * Scale shape: one bounded-state collapse + one key equi-join — both
  * shuffle on the merge key only; with the base bucketed on the key the
  * join side of a nightly 100 TB merge is co-located and Exchange-free
  * (graft.etl.Bucketing).
  *
  * Reference analogue: the audit lambda's per-update DynamoDB overwrite
  * (etl_job_auditor/lambda_handler.py) is this merge with a singleton
  * changelog; CdcMerge is the set-at-a-time form a lake needs.
  */
object CdcMerge {

  /** @param base     current snapshot, unique per `keys`
    * @param changes  changelog rows carrying the FULL row image in the
    *                 same-named columns as `base`, plus `opCol`
    * @param keys     merge key column names
    * @param opCol    op discriminator on `changes`; rows where
    *                 `opCol === deleteOp` delete, all others upsert
    * @param version  change order within a key (latest wins)
    * @param deleteOp value of `opCol` that means delete */
  def merge(base: DataFrame, changes: DataFrame, keys: Seq[String],
            opCol: Column, version: Seq[Column],
            deleteOp: String = "D"): DataFrame = {
    val payloadCols = base.columns.filterNot(keys.contains).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(_.desc): _*)
    val latest = changes
      .withColumn("__op", opCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(keys.map(col) ++ payloadCols.map(c => col(c).as(s"__chg_$c"))
        :+ col("__op"): _*)
    base.join(latest, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(keys.map(col) ++ payloadCols.map(c =>
        when(col("__op").isNotNull, col(s"__chg_$c")).otherwise(col(c)).as(c))
        :+ col("__op").isNotNull.as("change_applied"): _*)
  }
}
