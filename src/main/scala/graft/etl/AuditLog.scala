package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL job-run audit trail.
  *
  * The reference tracks each pipeline execution in DynamoDB: an insert at
  * trigger time (state_machine_trigger/lambda_handler.py:15-46) and an
  * upsert of latest status + timestamp on completion
  * (etl_job_auditor/lambda_handler.py). graft models the trail as an
  * append-only event log — the scalable shape: upserts become a
  * latest-record-per-key query instead of in-place mutation.
  */
object AuditLog {

  /** Latest-state view of an append-only status log: one row per
    * execution with its latest status, last-update time, first-start
    * time, and update count. Deterministic tie-break on `tieBreak`.
    *
    * This is the reference's DynamoDB `update_item` semantics expressed
    * as a window query — one shuffle on the execution key, no driver
    * round-trips, any scale. */
  def latestState(log: DataFrame, executionId: Column, status: Column,
                  ts: Column, tieBreak: Column): DataFrame = {
    val byExec = Window.partitionBy(executionId)
    val latestFirst = byExec.orderBy(ts.desc, tieBreak.desc)
    log
      .withColumn("rn", row_number().over(latestFirst))
      .withColumn("n_updates", count(lit(1)).over(byExec))
      .withColumn("job_start_date", min(ts).over(byExec))
      .filter(col("rn") === 1)
      .select(
        executionId.as("execution_id"),
        status.as("job_latest_status"),
        ts.as("joblast_updated_timestamp"),
        col("job_start_date"),
        col("n_updates"))
  }
}
