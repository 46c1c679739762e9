package graft

import graft.streaming.StreamShard
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamShardSpec extends AnyFunSuite with SparkSpec {

  private def wipe(dir: String): Unit = {
    val f = new java.io.File(dir)
    if (f.exists()) graft.Fs.deleteRec(f.toPath)
  }

  test("streamed shard layout's manifest equals the batch q_shard_manifest lane on real documents") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real corpus, replayed in three uneven micro-batches through the
    // actual streaming query; the routed layout's manifest must be
    // row-identical to the batch operator behind the oracle-checked
    // q_shard_manifest (assignment is stateless, so ANY batching works)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    val out = "target/stream-shard-out"
    wipe(out)
    val in = MemoryStream[(Long, Long)]
    val q = StreamShard.shardRouter(
      in.toDF().toDF("doc_id", "n_chars"), "doc_id", 8, out)
    Seq(docs.take(7), docs.slice(7, 30), docs.drop(30)).foreach { b =>
      in.addData(b); q.processAllAvailable()
    }
    q.stop()
    val streamed = StreamShard.manifestOf(spark, out,
        Seq("sum_chars" -> "n_chars"))
      .orderBy($"shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = graft.operators.Sharding.manifest(
        Tables.documents(spark, sf), $"doc_id", 8,
        Seq("sum_chars" -> $"n_chars"))
      .orderBy($"shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.sameElements(batch),
      s"stream/batch manifests diverge:\n${streamed.toList}\n${batch.toList}")
  }

  test("routed membership is batching-invariant and equals batch assignment") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id").collect().map(_.getLong(0)).toVector
    def route(out: String, batches: Seq[Seq[Long]]): Map[Long, Long] = {
      wipe(out)
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamShard.routeBatch(b.toDF("doc_id"), "doc_id", 4, out, i.toLong)
      }
      spark.read.parquet(out)
        .select($"doc_id", $"shard_id".cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val a = route("target/stream-shard-a", Seq(docs))
    val b = route("target/stream-shard-b", docs.grouped(11).toSeq)
    assert(a == b, "membership depends on batching")
    val want = graft.operators.Sharding.assign(
        docs.toDF("doc_id"), $"doc_id", 4)
      .select($"doc_id", $"shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == want, "streamed membership != batch assignment")
  }

  test("a replayed micro-batch overwrites its own subdir — no duplicates") {
    import spark.implicits._
    val out = "target/stream-shard-replay"
    wipe(out)
    val b0 = (1L to 20L).toVector
    val b1 = (21L to 35L).toVector
    StreamShard.routeBatch(b0.toDF("doc_id"), "doc_id", 4, out, 0L)
    StreamShard.routeBatch(b1.toDF("doc_id"), "doc_id", 4, out, 1L)
    // crash-recovery replay: foreachBatch re-delivers batchId 1
    StreamShard.routeBatch(b1.toDF("doc_id"), "doc_id", 4, out, 1L)
    val got = spark.read.parquet(out).select($"doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(got.sameElements((b0 ++ b1).sorted),
      s"replay duplicated or dropped rows: ${got.length} rows")
    val m = StreamShard.manifestOf(spark, out, Nil).collect()
    assert(m.map(_.getLong(1)).sum == 35L, "manifest counts inflated")
  }
}
