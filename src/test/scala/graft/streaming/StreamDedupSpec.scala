package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import graft.operators.{Dedup, OpCaches}
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming near-dup dedup must give the BATCH engine's answers: same
  * candidates (shared banding), same exact-Jaccard verify, same greedy
  * first-wins policy — re-keyed by event time with watermark-bounded
  * bucket state. */
class StreamDedupSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  /** Arrival sequence with ids monotone in arrival order: originals from
    * the documents table interleaved with exact copies and near-copies
    * (a few words changed) of EARLIER arrivals, spread over `nBatches`
    * micro-batches. */
  private def arrivals(): Seq[(Long, Timestamp, String)] = {
    val base = Tables.documents(spark, sf).select("text")
      .limit(30).collect().map(_.getString(0))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    base.zipWithIndex.foreach { case (t, i) =>
      out += t
      if (i % 3 == 0) out += t // exact copy of the immediately prior doc
      if (i % 5 == 0) { // near-copy: keep most of the shingle set
        val w = t.split(" "); out += (w.take(w.length - 2) :+ "zzz").mkString(" ")
      }
    }
    out.zipWithIndex.map { case (t, i) => (i.toLong, ts(i), t) }.toSeq
  }

  test("streaming verdicts equal the batch greedy policy, batch-split-invariant") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seq = arrivals()
    val in = MemoryStream[(Long, Timestamp, String)]
    val hits = StreamDedup.nearDupHits(
      in.toDF().toDF("doc_id", "ts", "text"),
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5,
      horizon = "1 day")
    val q = hits.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ndh").start()
    // three uneven micro-batches — the verdict must not depend on where
    // the batch boundaries fall
    val cuts = Seq(seq.take(7), seq.slice(7, 25), seq.drop(25))
    cuts.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    val got = StreamDedup.verdicts(spark.table("ndh")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    // batch reference: all docs at once through the LSH pair pipeline,
    // kept = no verified partner with a smaller id
    val all = seq.toDF("doc_id", "ts", "text")
    val pairs = Dedup.minhashLshPairs(all, $"text", $"doc_id",
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    OpCaches.releaseAll()
    val want = seq.map { case (id, _, _) =>
      val partners = pairs.collect { case (a, b) if b == id => a }.distinct
      id -> (partners.length.toLong, partners.isEmpty)
    }.toMap

    assert(got.keySet == want.keySet, "every doc must get exactly one verdict")
    val diff = want.collect { case (id, w) if got(id) != w => (id, w, got(id)) }
    assert(diff.isEmpty, s"stream/batch verdict mismatches: ${diff.take(5)}")
    // non-vacuous: the planted copies were actually caught, incl. a
    // near-copy (jaccard < 1) — not only byte-identical repeats
    assert(want.count(!_._2._2) >= 10, "plant enough duplicates")
    val nearIds = seq.collect { case (id, _, t) if t.endsWith(" zzz") => id }
    assert(nearIds.exists(id => !got(id)._2),
      "a near-copy (non-exact) must be dropped too")
  }

  test("streamed pairs and verdicts equal the q_dedup_minhash driver query on the full documents table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // driver-oracle anchor: the ENTIRE real documents table (not a
    // planted sample) streamed in doc_id order with one horizon
    // covering the whole corpus must reproduce the oracle-checked
    // q_dedup_minhash pair set — same (id_a, id_b) pairs, same
    // verified jaccard — and the per-doc verdicts must equal the
    // first-wins policy derived from those driver-query rows.
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, Timestamp, String)]
    val hits = StreamDedup.nearDupHits(
      in.toDF().toDF("doc_id", "ts", "text"),
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5,
      horizon = "30 days")
    val q = hits.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ndh_drv").start()
    docs.zipWithIndex.map { case ((id, t), i) => (id, ts(i), t) }
      .grouped(120).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val streamedPairs = spark.table("ndh_drv")
      .filter($"partner" >= 0)
      .select($"partner".as("id_a"), $"doc_id".as("id_b"),
        round($"jaccard", 6).as("jaccard"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = SparkEntry.queries("q_dedup_minhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    OpCaches.releaseAll()
    assert(streamedPairs == want,
      s"stream/driver pair sets diverge: onlyStream=${streamedPairs -- want} " +
        s"onlyBatch=${want -- streamedPairs}")
    assert(want.nonEmpty, "the driver query must find pairs on real docs")
    val verdicts = StreamDedup.verdicts(spark.table("ndh_drv")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val dropped = want.map(_._2)
    docs.foreach { case (id, _) =>
      assert(verdicts(id) == !dropped.contains(id),
        s"doc $id verdict diverges from the driver pair policy")
    }
  }

  test("watermark horizon bounds both comparisons and state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val text = Tables.documents(spark, sf).select("text")
      .limit(1).collect().head.getString(0)
    val in = MemoryStream[(Long, Timestamp, String)]
    val hits = StreamDedup.nearDupHits(
      in.toDF().toDF("doc_id", "ts", "text"),
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5,
      horizon = "1 hour")
    val q = hits.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ndh_hz").start()
    // doc 0 at 10:00; doc 1 (unrelated) at 13:00 advances the watermark
    // to 12:00; doc 2 repeats doc 0's text at 13:01 — its partner is
    // beyond the horizon and must have been EVICTED, so doc 2 is kept
    in.addData(Seq((0L, Timestamp.valueOf("2024-03-01 10:00:00"), text)))
    q.processAllAvailable()
    in.addData(Seq((1L, Timestamp.valueOf("2024-03-01 13:00:00"), "totally different words")))
    q.processAllAvailable()
    in.addData(Seq((2L, Timestamp.valueOf("2024-03-01 13:01:00"), text)))
    q.processAllAvailable()
    val v = StreamDedup.verdicts(spark.table("ndh_hz")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(v == Map(0L -> true, 1L -> true, 2L -> true),
      s"the cross-horizon repeat must be kept, got $v")
    // state is bounded by the horizon: doc 0's buckets timed out, so at
    // most docs 1 and 2 (16 buckets each) remain
    val st = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsTotal)
    q.stop()
    assert(st.exists(_ <= 32L),
      s"evicted buckets must leave state (got $st rows, want <= 32)")
  }

  test("same-batch duplicates are caught with id-order tie-break") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val text = Tables.documents(spark, sf).select("text")
      .limit(1).collect().head.getString(0)
    val in = MemoryStream[(Long, Timestamp, String)]
    val hits = StreamDedup.nearDupHits(
      in.toDF().toDF("doc_id", "ts", "text"),
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5,
      horizon = "1 hour")
    val q = hits.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ndh_sb").start()
    in.addData(Seq(
      (7L, Timestamp.valueOf("2024-03-01 10:00:00"), text),
      (3L, Timestamp.valueOf("2024-03-01 10:00:30"), text)))
    q.processAllAvailable()
    q.stop()
    val v = StreamDedup.verdicts(spark.table("ndh_sb")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(v == Map(3L -> true, 7L -> false),
      s"smaller id wins inside one batch, got $v")
  }
}
