package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic training-shard export — the landing stage a training
  * consumer needs AFTER curation: a reproducible global shuffle of the
  * corpus and a balanced assignment of documents to N output shards,
  * plus the per-shard manifest (doc/char/token totals) the training
  * job's data loader reads to plan epochs.
  *
  * Reference scope: the reference pipeline lands conformed /
  * purpose-built parquet for downstream consumers
  * (aws-cdk-pipelines-datalake-etl: lib/glue_scripts/etl_conformed_to
  * _purposebuilt.py) — this operator is the LLM-training shape of that
  * landing step: sequential readers must see i.i.d. data (shuffled),
  * N concurrent readers must stream N disjoint shards (sharded), and a
  * re-run over the same corpus must produce byte-identical shards
  * (deterministic, so checkpoint-resumed training stays aligned).
  *
  * Randomness is the engine-portable md5 recipe (Sampling.hashBucket's
  * convention), on TWO independent channels — `shard:`+key for shard
  * membership and `pos:`+key for intra-shard order — so a document's
  * shard and its position within the shard are uncorrelated (one
  * channel would make position a function of the same bits that chose
  * the shard, biasing early positions toward low residues).
  *
  * Scale shape: `assign` is pure scan-stage expressions (no shuffle);
  * `withPositions` shuffles ONCE on shard_id — exactly the exchange
  * the shard write itself needs, so the row_number window rides the
  * write partitioning rather than adding a stage; `manifest` is one
  * small aggregation with map-side partials. Shard balance is
  * law-of-large-numbers over the md5-uniform (binomial σ/μ ≈
  * 1/sqrt(rows/shards)), which at 100 TB / thousands of shards is
  * tighter than any greedy bin-packing pass could justify paying a
  * global sort for. */
object Sharding {

  /** Stable shard id in [0, nShards): first 8 md5 hex chars of the
    * salted stringified key, mod nShards. */
  def shardOf(key: Column, nShards: Int): Column =
    conv(substring(md5(concat(lit("shard:"), key.cast(StringType))), 1, 8), 16, 10)
      .cast(LongType) % nShards

  /** Intra-shard shuffle key: an md5 channel independent of shardOf. */
  def shuffleKey(key: Column): Column =
    md5(concat(lit("pos:"), key.cast(StringType)))

  /** Adds `shard_id` and `shuffle_key` — scan-stage only. */
  def assign(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard_id", shardOf(key, nShards))
      .withColumn("shuffle_key", shuffleKey(key))
  }

  /** Adds `shuffle_pos` (1-based position within the shard, in shuffle
    * order, key as tiebreak): one exchange on shard_id — the write
    * partitioning — then a per-shard sort that IS the write order. */
  def withPositions(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("shuffle_key"), key)
    assign(df, key, nShards)
      .withColumn("shuffle_pos", row_number().over(w).cast(LongType))
  }

  /** Per-shard manifest: doc count plus the sums of the given weight
    * columns (chars, tokens, …) — the loader-facing epoch plan. */
  def manifest(df: DataFrame, key: Column, nShards: Int,
               weights: Seq[(String, Column)]): DataFrame = {
    val aggs = weights.map { case (n, c) => sum(c).cast(LongType).as(n) }
    assign(df, key, nShards)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
  }

  /** Deterministic weighted interleave — the ordered form of the
    * mixture question Sampling.mixToShares answers by subsampling:
    * instead of dropping rows to hit target shares, ORDER the merged
    * corpus so every prefix tracks the target mixture (the
    * fixed-rate source interleave training streams use, e.g. the Pile
    * recipe of interleaving component datasets at set rates).
    *
    * Classic weighted-fair-queueing virtual time, kept in exact
    * integers: within each group rows take rank r (by the md5 shuffle
    * channel, so intra-group order is itself shuffled), and the merged
    * order is by vt = r * (L / w_g) where L = lcm of the integer
    * weights — a group with twice the weight emits twice as often.
    * Ties across groups break by (group, key): all integer/string
    * comparisons, nothing float, so any engine replays the exact
    * order.
    *
    * Scale shape: one exchange on the group key for the per-group
    * rank; the global prefix of size k needs only rows with r <= k
    * per group (a stream that has emitted k rows total has emitted at
    * most k from any one group), so `interleavePrefix` filters to
    * <= k·|groups| rows before the single tiny top-k — the corpus
    * never globally sorts. */
  def interleavePrefix(df: DataFrame, group: Column, key: Column,
                       weights: Map[String, Int], k: Int): DataFrame = {
    require(weights.values.forall(_ > 0), "weights must be positive")
    // lcm in BigInt: large co-prime weights would silently overflow the
    // Long fold and corrupt every stride; an unrepresentable weight set
    // (or one whose max virtual time k·lcm exceeds Long) fails loudly
    val lcmBig = weights.values.foldLeft(BigInt(1))((a, b) =>
      a / a.gcd(BigInt(b)) * b)
    require((lcmBig * k).isValidLong,
      s"weight lcm $lcmBig times k=$k overflows Long; reduce the weights " +
        "to a coarser ratio")
    val lcmAll = lcmBig.toLong
    val spark = df.sparkSession
    import spark.implicits._
    val wtab = weights.toSeq.map { case (g, w) => (g, lcmAll / w) }
      .toDF("grp", "stride")
    val wg = Window.partitionBy(group).orderBy(shuffleKey(key), key)
    val ranked = df.join(broadcast(wtab), group === col("grp"))
      .withColumn("grp_rank", row_number().over(wg).cast(LongType))
      .filter(col("grp_rank") <= k)
      .withColumn("vt", col("grp_rank") * col("stride"))
    val wAll = Window.orderBy(col("vt"), group, key)
    ranked
      .withColumn("interleave_pos", row_number().over(wAll).cast(LongType))
      .filter(col("interleave_pos") <= k)
      .drop("grp", "stride")
  }
}
