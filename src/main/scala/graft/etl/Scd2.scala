package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history building: turn an append-only
  * update stream into versioned rows with effective-time ranges — the
  * standard lake primitive for auditable dimension tables, and the
  * history-preserving complement of Compaction.latestByKey (which keeps
  * only the newest row; reference analogue: the audit lambda's
  * per-update overwrite, etl_job_auditor/lambda_handler.py).
  *
  * Two window passes over the key partition, both on the SAME partition
  * key — Catalyst plans them into one shuffle (Window operators stack on
  * a single Exchange on `keys`):
  *   1. change collapse: a row survives only if its tracked payload
  *      differs from the previous row's (or it is the first) — repeated
  *      identical snapshots don't create versions;
  *   2. interval stitch: effective_to = next survivor's effective_from;
  *      the open row (effective_to IS NULL) is current.
  *
  * At 100 TB the stream shuffles once on the dimension key and every
  * window is bounded by a key's update count; no self-join, no
  * driver-side state.
  */
object Scd2 {

  /** @param updates  append-only update rows
    * @param keys     dimension identity (partition key)
    * @param eventTime update timestamp column (version order)
    * @param tieBreak  extra ordering for same-timestamp updates
    * @param tracked  payload columns whose change opens a new version */
  def history(updates: DataFrame, keys: Seq[Column], eventTime: Column,
              tieBreak: Seq[Column], tracked: Seq[Column]): DataFrame = {
    val order = eventTime +: tieBreak
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.asc): _*)
    // a struct compares component-wise, so one lag covers all tracked cols;
    // null-safe inequality keeps rows whose previous version is NULL-valued
    val payload = struct(tracked: _*)
    val changed = updates
      .withColumn("__prev", lag(payload, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> payload))
      .drop("__prev")
    val w2 = Window.partitionBy(keys: _*).orderBy(order.map(_.asc): _*)
    changed
      .withColumn("effective_from", eventTime)
      .withColumn("effective_to", lead(eventTime, 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
