package graft.operators

import graft.plans.Bloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-accelerated semi join.
  *
  * A plain left-semi join shuffles EVERY probe-side row on the join key;
  * when the build side is selective (a filtered fact slice, a blocklist,
  * a sampled id set) most of that shuffle is wasted on rows with no
  * match. This operator first aggregates the build side's key hashes
  * into a bloom filter (map-side partial aggregation, ~MBs), broadcasts
  * the one-row result, and filters the probe side MAP-SIDE before the
  * exact semi join. False positives only cost shuffle rows — the exact
  * join removes them — so output is exactly the plain semi join's.
  *
  * This is the explicit, always-on form of Spark's runtime row-level
  * filtering (spark.sql.optimizer.runtime.bloomFilter), which only fires
  * under narrow cost conditions; here the caller states the asymmetry.
  */
object BloomJoin {

  /** Rows of `probe` with at least one `build` match (left-semi), with a
    * map-side bloom pre-filter on the probe scan. Key columns must have
    * distinct names on the two sides.
    *
    * The bloom build runs EAGERLY (one distributed aggregate; only the
    * final bit array — numBits/8 bytes, 512 KiB by default — reaches the
    * driver, like a broadcast build). Eagerness is what keeps the probe
    * filter a plain predicate: expressed as a join against a one-row
    * bloom DataFrame, Catalyst's join reorder hoists it ABOVE the exact
    * semi join, filtering after the shuffle it was meant to avoid. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               numBits: Long = 1L << 22, numHashes: Int = 5): DataFrame = {
    require(probeKey != buildKey,
      "probe/build key columns must be named differently")
    val bloomBytes = build.agg(
        Bloom.build(xxhash64(col(buildKey)), numBits, numHashes).as("_bloom"))
      .collect().head.getAs[Array[Byte]](0)
    probe.filter(Bloom.probe(bloomBytes, xxhash64(col(probeKey)), numHashes))
      .join(build, col(probeKey) === col(buildKey), "left_semi")
  }
}
