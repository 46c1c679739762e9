package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: gap-based session assignment via lag + running
  * count — one shuffle on the user key, everything else window-local.
  * (The streaming twin lives in graft.streaming.StreamOps with explicit
  * state + timeouts.) */
object Sessionize {

  /** Assign 1-based session ids per user: a new session starts when the
    * gap since the previous event exceeds `gapMinutes`. `tieBreak` makes
    * the intra-user event order total (deterministic). */
  def assign(events: DataFrame, user: Column, ts: Column, tieBreak: Column,
             gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull, 1L)
      .when(ts > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: bounds, event count, decimal-exact value total. */
  def summary(events: DataFrame, user: Column, ts: Column, tieBreak: Column,
              value: Column, gapMinutes: Int): DataFrame =
    assign(events, user, ts, tieBreak, gapMinutes)
      .groupBy(user.as("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("total_value"))
}
