package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for scale experiments: runs one named
  * SparkEntry query N times against a data dir through the same noop
  * sink as Bench, printing each run's seconds. Construction happens
  * INSIDE the timed window, exactly like Bench.run — several operators
  * (iterative CC, the LSH candidate count) do real work eagerly while
  * the DataFrame is being built, and timing only the final write would
  * silently exclude it.
  *
  * Args: <query> [dir] [n] [nosort]. With `nosort`, a global Sort at
  * the root of the logical plan is peeled off before execution —
  * isolates how much of a query's time is the deterministic ORDER BY
  * the driver's hash-compare needs (output formatting, not operator
  * work — at production scale results stream to a sink unsorted).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val nosort = args.contains("nosort")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
      .config("spark.ui.enabled", "false")
      // r18 (ADVICE): Bench/Verify carry 8g headroom for the triangle
      // lane's broadcast-adjacency collects near the 50 M-element bound
      // — brackets must run config-identical to the gate or the same
      // lane could abort (or pick the shuffle plan) only here
      .config("spark.driver.maxResultSize", "8g")
      // 32 MB scan splits (r17, measured A/B - see Bench): builder
      // brackets must measure the same scan fan-out the gate runs
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      // static conf: the 100-entry default codegen cache recompiles
      // stage-rich lanes every execution (r17; see build.sbt)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // keep codegen class names stable across AQE stage renumbering
      // so repeat executions hit the codegen cache (r17; see build.sbt)
      .config("spark.sql.codegen.useIdInClassName", "false")
      .appName("graft-querytime")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PLANDUMP=<dir>: write every execution's FINAL
    // (post-AQE) physical plan to <dir>/plan-<seq>.txt — the diff
    // harness for run-to-run plan instability (r17: lanes recompiling
    // codegen on every run must be flapping their physical plans;
    // diffing a fast run's dump against a slow run's names the flip).
    sys.env.get("SPARK_GRAFT_PLANDUMP").foreach { dir =>
      new java.io.File(dir).mkdirs()
      val seq = new java.util.concurrent.atomic.AtomicInteger()
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val i = seq.incrementAndGet()
            try java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$dir/plan-$i.txt"),
              qe.explainString(
                org.apache.spark.sql.execution.ExtendedMode))
            catch { case _: Throwable => () }
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
    for (i <- 1 to n) {
      // r17: per-run compilation deltas (HotSpot JIT ms; whole-stage-
      // codegen compile count = codegen-cache misses) — the direct test
      // of "is a repeat execution recompiling its plans?" (VERDICT r16
      // ask 2: q_minhash_recall's warm run repeated the heavy-CPU
      // signature a first-execution-JIT story can't explain)
      val jit0 = graft.Sentinel.jitMs()
      val cg0 = graft.Sentinel.codegenCompiles()
      val b0 = graft.operators.BuildMeter.seconds
      val t0 = System.nanoTime()
      val df0 = graft.SparkEntry.queries(q)(spark, dir)
      val df = if (nosort) {
        import org.apache.spark.sql.catalyst.plans.logical.Sort
        df0.queryExecution.logical match {
          case Sort(_, true, child, _) =>
            org.apache.spark.sql.graft.GraftInternal.ofRows(
              spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
              child)
          case _ => df0
        }
      } else df0
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // jit_ms reads "null" on a JVM without compilation-time
      // monitoring (r18, ADVICE — a silent 0 would read as "no JIT work")
      val jitD = graft.Sentinel.jitDeltaJson(jit0, graft.Sentinel.jitMs())
      val cgD = graft.Sentinel.codegenCompiles() - cg0
      val bD = graft.operators.BuildMeter.seconds - b0
      println(f"querytime: $q run$i $dt%.3f s (build $bD%.3f)" +
        (if (nosort) " (nosort)" else "") +
        s"  jit_ms=$jitD codegen_compiles=$cgD")
      // Bench-style teardown so runs are independent: drop cached plans
      // AND persisted/localCheckpoint'd RDDs a query pinned while built.
      spark.catalog.clearCache()
      graft.operators.OpCaches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
