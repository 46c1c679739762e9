package graft

/** Targeted log-noise control for the harness mains (Bench/Verify/tools).
  *
  * One warning class is suppressed, narrowly: WindowExec's
  * "No Partition Defined" fires per task for WeightedSample.sample's
  * k-survivor ranking window, which is unpartitioned BY DESIGN — it runs
  * above a bounded top-k, so the "single partition" holds k rows, not the
  * corpus (the safe shape is pinned by PlanSpec). A constant partition
  * key can't quiet it (Catalyst folds foldable partition expressions
  * away), and at bench scale the repeated warning buried the contract
  * line under hundreds of identical lines. Everything else keeps Spark's
  * default levels — this must stay a per-logger setting, never a global
  * level drop.
  */
object Logs {
  def quietKnownNoise(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
