package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once derived-table cache — the generalized form of the
  * machinery [[CoPurchase]] introduced: build a deterministic derived
  * table once per JVM, write it as parquet, hand every consumer a plain
  * scan. At 100 TB this is the production shape for any derivation
  * shared by multiple jobs (edge builds, duplicate-span indexes): the
  * expensive shuffle runs in one nightly writer, readers pay a scan
  * with normal pushdown/pruning, and nothing lives in executor memory
  * (cache teardown between queries can't touch it).
  *
  * Correctness contract: `build` must be DETERMINISTIC for the given
  * key and produce parquet-exact columns (longs/strings/etc.) — the
  * specs pin each registered derivation row-identical to its inline
  * form. Concurrency: double-checked under one coarse lock, NEVER
  * ConcurrentHashMap.computeIfAbsent — a build that reads another
  * derived table would nest computes on the same map, which throws
  * "Recursive update" whenever the two keys share a hash bin (bin
  * placement depends on the key string, so it bites only on some data
  * dirs — found the hard way in round 11). */
object DerivedCache {

  private val paths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // PER-KEY build monitors (computeIfAbsent here is side-effect-free, so
  // the recursive-update hazard doesn't apply): builds of unrelated
  // derivations never serialize on each other — only same-key racers
  // wait. Nested builds (edges reading items) acquire child-key monitors
  // while holding the parent's; the registered derivations nest in one
  // direction only, so no cycle (a new derivation pair that nested BOTH
  // ways could deadlock — don't do that).
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private lazy val baseDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derived")
    // the derivations are GB-scale at sf10 and per-JVM: clear them on
    // exit or every bench/verify/test run leaks its full set to /tmp —
    // the same disk the shuffle already pressures
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.Fs.deleteRec(d)))
    d.toString
  }

  /** The derived table for `key` (any stable string naming the data dir
    * + derivation variant), building and writing it on first call. */
  def table(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val existing = paths.get(key)
    val p = if (existing != null) existing
    else keyLocks.computeIfAbsent(key, _ => new Object).synchronized {
      val again = paths.get(key)
      if (again != null) again
      else {
        val out = s"$baseDir/${Integer.toHexString(key.hashCode)}_" +
          key.replaceAll("[^A-Za-z0-9_.-]", "_").takeRight(40)
        build.write.mode("overwrite").parquet(out)
        paths.put(key, out)
        out
      }
    }
    s.read.parquet(p)
  }
}
