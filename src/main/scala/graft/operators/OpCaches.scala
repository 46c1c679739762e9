package graft.operators

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ListBuffer

/** Registry for the MEMORY_AND_DISK intermediates the dedup/similarity
  * pipelines persist.
  *
  * Those operators RETURN lazy DataFrames, so intermediates that the
  * returned plan still references (the distinct-fingerprint table, the
  * member map, the candidate-pair list) cannot be unpersisted inside the
  * operator — they are consumed when the CALLER materializes the result,
  * and releasing them early would silently recompute the most expensive
  * stages up to three times (the shingle kernel feeds three joins).
  * Intermediates whose last consumer runs inside the operator (the raw
  * fingerprint table once the collapse chose representatives) ARE
  * released eagerly at that point.
  *
  * The caching contract for library callers is therefore: materialize the
  * returned DataFrame(s), then call [[OpCaches.releaseAll]] — one call
  * frees every pipeline cache this session accumulated. Unpersist is
  * idempotent, so blocks already torn down externally (as graft.Bench
  * does between queries via `getPersistentRDDs`) are a no-op here; the
  * registry still drops its references so a long-lived session doesn't
  * accumulate plan objects either.
  */
object OpCaches {

  private val tracked = ListBuffer.empty[Dataset[_]]

  /** Register a persisted intermediate for deferred release. */
  private[operators] def track[T <: Dataset[_]](ds: T): T = synchronized {
    tracked += ds
    ds
  }

  /** Drop ONE dataset from the registry after an in-operator unpersist —
    * keeps trackedCount an exact mirror of live pipeline caches. */
  private[operators] def untrack(ds: Dataset[_]): Unit = synchronized {
    val i = tracked.indexWhere(_ eq ds)
    if (i >= 0) tracked.remove(i)
  }

  /** Unpersist every registered pipeline cache and clear the registry.
    * Call once the returned DataFrames have been materialized (written,
    * collected, counted). Safe to call at any time — early release only
    * costs recomputation, never correctness. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently registered (live) pipeline caches. */
  def trackedCount: Int = synchronized(tracked.size)
}
