package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Merge-on-read CDC lane (StreamOps.appendDeltaBatch / readMergeOnRead
  * / compactMergeOnRead): the reconciled read must equal a single
  * CdcMerge over the whole changelog — the q_cdc_merge semantics — at
  * every prefix, across compaction points, under batch replay, and on
  * real data against the copy-on-write lane's snapshot. */
class CdcMorSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String = {
    val p = Paths.get(s"target/test-tmp/mor-${System.nanoTime()}")
    Files.createDirectories(p)
    p.toString
  }

  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, String, Double, String, Long)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("k", "name", "amount", "op", "ver")
  }

  private def snap(d: DataFrame): Map[Long, (String, Double)] =
    d.collect().map(r => r.getLong(r.fieldIndex("k")) ->
      (r.getString(r.fieldIndex("name")), r.getDouble(r.fieldIndex("amount"))))
      .toMap

  /** One-shot CdcMerge over the whole changelog — the ground truth. */
  private def oneShot(changelog: Seq[(Long, String, Double, String, Long)])
      : Map[Long, (String, Double)] = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        df(changelog).schema.filterNot(_.name == "op")))
    snap(graft.etl.CdcMerge.merge(empty, df(changelog), Seq("k"),
      col("op"), Seq(col("ver"))).drop("change_applied"))
  }

  private val batch1 = Seq(
    (1L, "a", 10.0, "I", 1L), (2L, "b", 20.0, "I", 2L), (3L, "c", 30.0, "I", 3L))
  private val batch2 = Seq(
    (2L, "b2", 25.0, "U", 4L), (4L, "d", 40.0, "I", 5L))
  private val batch3 = Seq(
    (1L, null.asInstanceOf[String], 0.0, "D", 6L), // tombstone
    (4L, "d2", 44.0, "U", 7L),
    (9L, null.asInstanceOf[String], 0.0, "D", 8L)) // delete of missing key

  test("reconciled read equals the one-shot CdcMerge at every prefix") {
    val dir = tmp()
    val batches = Seq(batch1, batch2, batch3)
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamOps.appendDeltaBatch(df(b), dir, i.toLong)
      val got = snap(StreamOps.readMergeOnRead(spark, dir,
        Seq("k"), "op", Seq("ver")))
      val want = oneShot(batches.take(i + 1).flatten)
      assert(got == want, s"prefix ${i + 1}: $got != $want")
    }
  }

  test("compaction folds the log into base without changing the read") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    StreamOps.appendDeltaBatch(df(batch2), dir, 1L)
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    // log cleared, base present
    assert(Files.isDirectory(Paths.get(dir, "base")))
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("delta_")))
    assert(snap(StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op",
      Seq("ver"))) == oneShot(batch1 ++ batch2))
    // appends after compaction reconcile against the compacted base
    StreamOps.appendDeltaBatch(df(batch3), dir, 2L)
    assert(snap(StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op",
      Seq("ver"))) == oneShot(batch1 ++ batch2 ++ batch3))
  }

  test("a replayed batch (same seq) leaves the reconciled read unchanged") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    StreamOps.appendDeltaBatch(df(batch2), dir, 1L)
    val before = snap(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver")))
    StreamOps.appendDeltaBatch(df(batch2), dir, 1L) // exactly-once replay
    val after = snap(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver")))
    assert(after == before)
    assert(before == oneShot(batch1 ++ batch2))
  }

  test("compaction crash window (base retired, new base unpromoted) heals on read") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    // simulate the crash: base moved aside, promote never happened
    Files.move(Paths.get(dir, "base"), Paths.get(dir, ".base_old"))
    StreamOps.appendDeltaBatch(df(batch2), dir, 1L)
    val got = snap(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver")))
    assert(got == oneShot(batch1 ++ batch2),
      "crashed compaction lost the base on the read path")
  }

  test("crash after compaction swap but before delta cleanup re-applies idempotently") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    StreamOps.appendDeltaBatch(df(batch2), dir, 1L)
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    // simulate the un-cleared consumed delta: re-create delta_1 post-swap
    StreamOps.appendDeltaBatch(df(batch2), dir, 1L)
    val got = snap(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver")))
    assert(got == oneShot(batch1 ++ batch2),
      "re-applied consumed delta changed the snapshot")
  }

  test("time travel: as-of seq reconciles each prefix; below the compaction horizon fails loudly") {
    val dir = tmp()
    val batches = Seq(batch1, batch2, batch3)
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamOps.appendDeltaBatch(df(b), dir, i.toLong)
    }
    // every historical prefix is reconstructible from the log
    batches.indices.foreach { i =>
      val got = snap(StreamOps.readMergeOnRead(spark, dir,
        Seq("k"), "op", Seq("ver"), asOfSeq = Some(i.toLong)))
      assert(got == oneShot(batches.take(i + 1).flatten), s"as-of $i")
    }
    // compact through seq 2, then append seq 3: travel to 2 and 3 still
    // works (2 = exactly the horizon), 1 is folded away and must fail
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    val b4 = Seq((7L, "g", 70.0, "I", 9L))
    StreamOps.appendDeltaBatch(df(b4), dir, 3L)
    assert(snap(StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op",
      Seq("ver"), asOfSeq = Some(2L))) == oneShot(batches.flatten))
    assert(snap(StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op",
      Seq("ver"), asOfSeq = Some(3L))) == oneShot(batches.flatten ++ b4))
    val e = intercept[IllegalArgumentException] {
      StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"),
        asOfSeq = Some(1L))
    }
    assert(e.getMessage.contains("compaction horizon"))
  }

  test("compacting an all-deleted snapshot yields a readable EMPTY table, not an error") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    // versions stay MONOTONE across batches (the standard changelog
    // contract compaction relies on: folded history can't re-order
    // against versions that arrive later)
    val deleteAll = batch1.map { case (k, _, _, _, v) =>
      (k, null.asInstanceOf[String], 0.0, "D", v + 5) }
    StreamOps.appendDeltaBatch(df(deleteAll), dir, 1L)
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    // the folded snapshot has zero rows — the write may emit no part
    // files, but the schema marker makes it a legitimate empty table
    val got = StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    assert(got.collect().isEmpty)
    assert(got.schema.fieldNames.toSet == Set("k", "name", "amount", "ver"))
    // life goes on: appends after the empty compaction reconcile normally
    val b4 = Seq((2L, "b9", 29.0, "I", 11L), (8L, "h", 80.0, "I", 12L))
    StreamOps.appendDeltaBatch(df(b4), dir, 2L)
    assert(snap(StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op",
      Seq("ver"))) == oneShot(batch1 ++ deleteAll ++ b4))
  }

  test("merge-on-read equals the copy-on-write partitioned snapshot on real orders") {
    val spark0 = spark
    import spark0.implicits._
    val root = tmp()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("pmonth",
        (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("int"))
    // the CdcSoak shape in miniature: seed everything, then two
    // single-month update batches and a delete batch
    val seed = orders.withColumn("op", lit("U")).withColumn("ver", lit(0L))
    val months = orders.select($"pmonth").distinct().orderBy($"pmonth")
      .as[Int].collect()
    def upd(i: Int): DataFrame = orders
      .filter($"pmonth" === months(i % months.length)).limit(500)
      .withColumn("o_totalprice", $"o_totalprice" + i)
      .withColumn("op", lit("U")).withColumn("ver", lit(i.toLong))
    val del = orders.filter($"o_orderkey" % 97 === 0).limit(200)
      .withColumn("op", lit("D")).withColumn("ver", lit(99L))
    val batches = Seq(seed, upd(1), upd(2), del)

    val cow = s"$root/cow"
    val mor = s"$root/mor"
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamOps.mergeBatchPartitioned(b, cow, Seq("o_orderkey"), "op",
        Seq("ver"), "pmonth")
      StreamOps.appendDeltaBatch(b, mor, i.toLong)
    }
    def sig(d: DataFrame) = d
      .agg(count(lit(1)).cast("long"),
        sum(xxhash64($"o_orderkey", $"o_totalprice", $"pmonth")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head
    val a = sig(spark.read.parquet(cow)
      .select($"o_orderkey", $"o_totalprice", $"pmonth"))
    val b = sig(StreamOps.readMergeOnRead(spark, mor, Seq("o_orderkey"),
        "op", Seq("ver"))
      .select($"o_orderkey", $"o_totalprice", $"pmonth"))
    assert(a == b, s"cow=$a mor=$b")
  }

  // ---- add-column schema evolution (graft.etl.SchemaEvolve) ----------

  /** batch2 widened with a `score` column — the evolution point. */
  private def df2(rows: Seq[(Long, String, Double, String, Long, Int)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("k", "name", "amount", "op", "ver", "score")
  }
  private val batch2e = Seq(
    (2L, "b2", 25.0, "U", 4L, 7), (4L, "d", 40.0, "I", 5L, 8))

  /** The evolved one-shot ground truth: pre-evolution changelog rows
    * carry NULL score, then one CdcMerge over the union. */
  private def oneShotEvolved(): Map[Long, (String, Double, Option[Int])] = {
    val full = df(batch1).withColumn("score", lit(null).cast("int"))
      .unionByName(df2(batch2e))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        full.schema.filterNot(_.name == "op")))
    snapE(graft.etl.CdcMerge.merge(empty, full, Seq("k"),
      col("op"), Seq(col("ver"))).drop("change_applied"))
  }
  private def snapE(d: DataFrame): Map[Long, (String, Double, Option[Int])] =
    d.collect().map(r => r.getLong(r.fieldIndex("k")) ->
      ((r.getString(r.fieldIndex("name")), r.getDouble(r.fieldIndex("amount")),
        if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getInt(r.fieldIndex("score")))))).toMap

  test("MOR: an add-column batch evolves the read (old rows NULL-filled)") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    StreamOps.appendDeltaBatch(df2(batch2e), dir, 1L)
    val got = snapE(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver")))
    assert(got == oneShotEvolved(), s"$got")
    // keys 1,3 predate the column; 2,4 were upserted after evolution
    assert(got(1L)._3.isEmpty && got(3L)._3.isEmpty)
    assert(got(2L)._3.contains(7) && got(4L)._3.contains(8))
  }

  test("MOR: evolution across a compaction point (base footer lacks the column)") {
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    StreamOps.appendDeltaBatch(df2(batch2e), dir, 1L)
    assert(snapE(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver"))) == oneShotEvolved())
    // compacting the evolved log folds the new column into the base...
    StreamOps.compactMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
    assert(snapE(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver"))) == oneShotEvolved())
    // ...and a post-evolution batch NOT carrying the column upserts NULL
    // for it (full-row-image convention) without narrowing the schema
    StreamOps.appendDeltaBatch(df(Seq((2L, "b3", 26.0, "U", 9L))), dir, 2L)
    val after = snapE(StreamOps.readMergeOnRead(spark, dir,
      Seq("k"), "op", Seq("ver")))
    assert(after(2L) == (("b3", 26.0, None)))
    assert(after(4L)._3.contains(8), "untouched key must keep its value")
  }

  test("MOR: a retyped column is rejected loudly, not silently cast") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    StreamOps.appendDeltaBatch(df(batch1), dir, 0L)
    val retyped = Seq((2L, "b2", "not-a-number", "U", 4L))
      .toDF("k", "name", "amount", "op", "ver") // amount: double -> string
    StreamOps.appendDeltaBatch(retyped, dir, 1L)
    val e = intercept[Exception] {
      StreamOps.readMergeOnRead(spark, dir, Seq("k"), "op", Seq("ver"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("merg") ||
      e.getMessage.contains("retyped"), e.getMessage)
  }

  test("COW mergeBatch: add-column stream equals the evolved one-shot merge") {
    val dir = tmp() + "/snap"
    StreamOps.mergeBatch(df(batch1), dir, Seq("k"), "op", Seq("ver"))
    StreamOps.mergeBatch(df2(batch2e), dir, Seq("k"), "op", Seq("ver"))
    assert(snapE(spark.read.parquet(dir)) == oneShotEvolved())
    // retype rejected loudly by SchemaEvolve before anything is written
    val spark0 = spark
    import spark0.implicits._
    val retyped = Seq((2L, "b2", "oops", "U", 9L))
      .toDF("k", "name", "amount", "op", "ver")
    val e = intercept[IllegalArgumentException] {
      StreamOps.mergeBatch(retyped, dir, Seq("k"), "op", Seq("ver"))
    }
    assert(e.getMessage.contains("retyped"))
    assert(snapE(spark.read.parquet(dir)) == oneShotEvolved(),
      "failed evolution must not have touched the snapshot")
  }

  test("COW partitioned: add-column widens, and a narrower batch can't drop columns") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/part"
    val b1 = Seq((1L, "a", 10.0, "I", 1L, 3), (2L, "b", 20.0, "I", 2L, 3))
      .toDF("k", "name", "amount", "op", "ver", "pday")
    StreamOps.mergeBatchPartitioned(b1, dir, Seq("k"), "op", Seq("ver"), "pday")
    // evolution point: add `score`
    val b2 = Seq((2L, "b2", 25.0, "U", 4L, 3, 7))
      .toDF("k", "name", "amount", "op", "ver", "pday", "score")
    StreamOps.mergeBatchPartitioned(b2, dir, Seq("k"), "op", Seq("ver"), "pday")
    val got1 = snapE(spark.read.parquet(dir))
    assert(got1 == Map(1L -> (("a", 10.0, None)), 2L -> (("b2", 25.0, Some(7)))))
    // a later batch WITHOUT score must not narrow the partition's schema
    val b3 = Seq((1L, "a2", 11.0, "U", 5L, 3))
      .toDF("k", "name", "amount", "op", "ver", "pday")
    StreamOps.mergeBatchPartitioned(b3, dir, Seq("k"), "op", Seq("ver"), "pday")
    val got2 = snapE(spark.read.parquet(dir))
    assert(got2 == Map(1L -> (("a2", 11.0, None)), 2L -> (("b2", 25.0, Some(7)))),
      "k=2's score must survive a narrower later batch")
  }
}
