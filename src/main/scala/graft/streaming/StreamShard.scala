package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Sharding

/** Streaming training-shard router — the stream form of the Sharding
  * export: a continuously arriving document feed lands directly in its
  * training-shard layout instead of accumulating in an unsharded
  * staging zone that a batch job re-shuffles later.
  *
  * Why this parallels the batch operator EXACTLY: shard assignment is
  * a pure function of record identity (the salted-md5 channel), with
  * no state, no ordering dependence and no batch-boundary dependence —
  * so the routed layout is identical for any micro-batching of the
  * same records, and identical to what the batch exporter would have
  * produced. The manifest is additive: per-shard counts/sums accumulate
  * across batches with no streaming state beyond the shard files
  * themselves (no watermark, no store — the lake IS the state).
  *
  * Scale shape: each micro-batch does scan-stage assignment plus one
  * write of its own batch-scoped subdir partitioned by shard_id —
  * O(batch) work, O(batch) write, never a rewrite of earlier batches;
  * replay overwrites only the replayed batch's subdir (idempotent).
  * Readers and the manifest query are shared with the batch layout
  * modulo the extra `ingest` partition column. Intra-shard ORDER is
  * the one thing streaming cannot reproduce (arrival interleaves
  * shards): positions remain the batch exporter's job at epoch-freeze
  * time — one bounded per-shard rank over the already-routed layout. */
object StreamShard {

  /** Route a document stream into `outDir/ingest=<batchId>/shard_id=N/`.
    * Each micro-batch writes its OWN ingest subdir with overwrite
    * semantics, so a batch replayed after a crash (foreachBatch re-runs
    * the same batchId on restart) REPLACES its own files instead of
    * appending duplicates — idempotence comes from the layout, not from
    * trusting the checkpoint to never re-deliver. A shard's content is
    * the union of `shard_id=N` dirs across the ingest subdirs
    * (partition discovery exposes both as columns; readers and the
    * manifest drop `ingest`). */
  def shardRouter(docs: DataFrame, key: String, nShards: Int,
                  outDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        routeBatch(batch, key, nShards, outDir, batchId)
      }
      .start()

  /** One micro-batch of [[shardRouter]] — package-visible so specs can
    * drive batches directly (the appendDeltaBatch convention). */
  private[graft] def routeBatch(batch: DataFrame, key: String,
                                nShards: Int, outDir: String,
                                batchId: Long): Unit =
    Sharding.assign(batch, col(key), nShards)
      .write.partitionBy("shard_id").mode("overwrite")
      .parquet(s"$outDir/ingest=$batchId")

  /** The routed layout's manifest: same aggregation the batch
    * q_shard_manifest runs, over the shard directories. */
  def manifestOf(spark: SparkSession, outDir: String,
                 weights: Seq[(String, String)]): DataFrame = {
    val aggs = weights.map { case (n, c) => sum(col(c)).cast("long").as(n) }
    spark.read.parquet(outDir)
      // partition-dir inference types shard_id as INT; restore the
      // batch manifest's long schema. ingest is the per-batch
      // idempotence dimension, not a data column.
      .drop("ingest")
      .withColumn("shard_id", col("shard_id").cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
  }
}
