package graft.streaming

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** Failure-injection tests for cdcUpsert's write-then-swap snapshot
  * promotion (StreamOps.swapSnapshot / recoverSnapshot). These pin the
  * crash-safety contract directly on the filesystem primitives — every
  * failure mode must fail LOUDLY with the live snapshot intact, and the
  * crash window between the two moves must be recoverable without data
  * loss. A silent failure here is silent data loss downstream: a batch
  * that "succeeds" against a stale or empty base permanently discards
  * prior upserts.
  */
class SnapshotSwapSpec extends AnyFunSuite with SparkSpec {

  private def tmpRoot(): Path = {
    val p = Paths.get(s"target/test-tmp/swap-${System.nanoTime()}")
    Files.createDirectories(p)
    p
  }

  /** A fake snapshot dir holding one marker file with `tag` content. */
  private def mkSnap(dir: Path, tag: String): Path = {
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-00000.parquet"), tag.getBytes("UTF-8"))
    dir
  }

  private def tagOf(dir: Path): String =
    new String(Files.readAllBytes(dir.resolve("part-00000.parquet")), "UTF-8")

  test("swap promotes staged dir and retires the previous snapshot") {
    val root = tmpRoot()
    val live = mkSnap(root.resolve("snap"), "v1")
    mkSnap(root.resolve("snap.tmp"), "v2")
    StreamOps.swapSnapshot(root.resolve("snap.tmp").toString, live.toString)
    assert(tagOf(live) == "v2")
    assert(tagOf(root.resolve("snap.old")) == "v1")
    assert(!Files.exists(root.resolve("snap.tmp")))
  }

  test("missing staged dir fails loudly and leaves the live snapshot unchanged") {
    val root = tmpRoot()
    val live = mkSnap(root.resolve("snap"), "v1")
    val e = intercept[java.io.IOException] {
      StreamOps.swapSnapshot(root.resolve("snap.tmp").toString, live.toString)
    }
    assert(e.getMessage.contains("refusing to swap"))
    assert(tagOf(live) == "v1") // live snapshot untouched
  }

  test("deep .old trees (the _temporary/ debris case) are cleared recursively") {
    val root = tmpRoot()
    val live = mkSnap(root.resolve("snap"), "v1")
    mkSnap(root.resolve("snap.tmp"), "v2")
    // a retired snapshot with committer debris: nested non-empty subdirs —
    // the shape that broke the pre-round-6 non-recursive delete and then
    // silently blocked every later retirement
    val debris = root.resolve("snap.old").resolve("_temporary").resolve("0")
    Files.createDirectories(debris)
    Files.write(debris.resolve("task-file"), "x".getBytes("UTF-8"))
    StreamOps.swapSnapshot(root.resolve("snap.tmp").toString, live.toString)
    assert(tagOf(live) == "v2")
    assert(tagOf(root.resolve("snap.old")) == "v1") // fresh retirement, debris gone
    assert(!Files.exists(root.resolve("snap.old").resolve("_temporary")))
  }

  test("failed promote move rolls the retired snapshot back and surfaces the error") {
    val root = tmpRoot()
    val live = mkSnap(root.resolve("snap"), "v1")
    mkSnap(root.resolve("snap.tmp"), "v2")
    // inject a promote failure AFTER the live dir has been retired to .old
    val e = intercept[java.io.IOException] {
      StreamOps.swapSnapshot(root.resolve("snap.tmp").toString, live.toString,
        promoteMove = (_, _) => throw new java.io.IOException("injected promote failure"))
    }
    assert(e.getMessage == "injected promote failure")
    // rollback restored the retired snapshot — readers never see nothing
    assert(Files.exists(live) && tagOf(live) == "v1")
  }

  test("crash window (only .old exists) is recovered, not read as an empty base") {
    val root = tmpRoot()
    val live = root.resolve("snap")
    // simulate a crash between the two moves: live is gone, .old has v1
    mkSnap(root.resolve("snap.old"), "v1")
    StreamOps.recoverSnapshot(live.toString)
    assert(Files.exists(live) && tagOf(live) == "v1")
    assert(!Files.exists(root.resolve("snap.old")))
  }

  test("recoverSnapshot is a no-op when the live snapshot exists") {
    val root = tmpRoot()
    val live = mkSnap(root.resolve("snap"), "v2")
    mkSnap(root.resolve("snap.old"), "v1")
    StreamOps.recoverSnapshot(live.toString)
    assert(tagOf(live) == "v2")
    assert(tagOf(root.resolve("snap.old")) == "v1") // left for the next swap
  }

  test("swap refuses to delete .old when it is the only surviving copy") {
    val root = tmpRoot()
    mkSnap(root.resolve("snap.old"), "v1") // live dir missing
    mkSnap(root.resolve("snap.tmp"), "v2")
    val e = intercept[java.io.IOException] {
      StreamOps.swapSnapshot(root.resolve("snap.tmp").toString,
        root.resolve("snap").toString)
    }
    assert(e.getMessage.contains("refusing to delete the only copy"))
    assert(tagOf(root.resolve("snap.old")) == "v1") // sole copy preserved
  }

  // ---- partition-scoped copy-on-write sink ------------------------------

  /** Map of (relative path → bytes) for every file under a partition dir —
    * byte-identity of untouched partitions is the copy-on-write contract. */
  private def fileBytes(dir: Path): Map[String, Seq[Byte]] = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => dir.relativize(p).toString -> Files.readAllBytes(p).toSeq)
        .toMap
    } finally s.close()
  }

  private def mergeBatch(rows: Seq[(Long, Int, String, Double, Long)], dir: String): Unit = {
    import spark.implicits._
    StreamOps.mergeBatchPartitioned(
      rows.toDF("k", "d", "op", "v", "ver"), dir,
      keys = Seq("k"), opCol = "op", version = Seq("ver"), partitionKey = "d")
  }

  private def readSnap(dir: String): Map[Long, (Int, Double)] = {
    import spark.implicits._
    spark.read.parquet(dir).select($"k", $"d", $"v").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
  }

  test("partitioned upsert rewrites ONLY the partitions the batch touches") {
    val dir = s"target/test-tmp/cdc-part-${System.nanoTime()}"
    mergeBatch(Seq((1L, 1, "U", 10.0, 1L), (2L, 2, "U", 20.0, 1L),
      (3L, 3, "U", 30.0, 1L)), dir)
    val d1Before = fileBytes(Paths.get(dir, "d=1"))
    val d3Before = fileBytes(Paths.get(dir, "d=3"))
    // second batch touches ONLY d=2
    mergeBatch(Seq((2L, 2, "U", 21.0, 2L), (4L, 2, "U", 40.0, 1L)), dir)
    assert(fileBytes(Paths.get(dir, "d=1")) == d1Before,
      "untouched partition d=1 must be byte-identical after the merge")
    assert(fileBytes(Paths.get(dir, "d=3")) == d3Before,
      "untouched partition d=3 must be byte-identical after the merge")
    assert(readSnap(dir) == Map(1L -> (1, 10.0), 2L -> (2, 21.0),
      3L -> (3, 30.0), 4L -> (2, 40.0)))
    // retired copy of the rewritten partition is dot-hidden from readers
    assert(Files.isDirectory(Paths.get(dir, ".old_d=2")))
  }

  test("partitioned delete-all drops the partition directory outright") {
    val dir = s"target/test-tmp/cdc-delall-${System.nanoTime()}"
    mergeBatch(Seq((1L, 1, "U", 10.0, 1L), (2L, 2, "U", 20.0, 1L)), dir)
    mergeBatch(Seq((2L, 2, "D", 20.0, 2L)), dir)
    assert(!Files.exists(Paths.get(dir, "d=2")),
      "a partition the merge emptied must be removed, not left stale")
    assert(readSnap(dir) == Map(1L -> (1, 10.0)))
    // a later batch can recreate the partition from scratch
    mergeBatch(Seq((5L, 2, "U", 50.0, 3L)), dir)
    assert(readSnap(dir) == Map(1L -> (1, 10.0), 5L -> (2, 50.0)))
  }

  test("delete-all after a prior rewrite does not resurrect rows from the stale .old copy") {
    // upsert → upsert (leaves a .old_d=2 rollback copy) → delete-all on d=2
    // → next batch. Before the fix, the delete-all branch removed live but
    // left the stale .old_d=2, and the next batch's recoverPartitions read
    // '.old present, live missing' as a crashed swap — moving the RETIRED
    // v1 data back into the live tree and resurrecting the deleted key.
    val dir = s"target/test-tmp/cdc-delres-${System.nanoTime()}"
    mergeBatch(Seq((1L, 1, "U", 10.0, 1L), (2L, 2, "U", 20.0, 1L)), dir)
    mergeBatch(Seq((2L, 2, "U", 21.0, 2L)), dir) // rewrite d=2 → .old_d=2 kept
    assert(Files.isDirectory(Paths.get(dir, ".old_d=2")))
    mergeBatch(Seq((2L, 2, "D", 21.0, 3L)), dir) // delete-all of d=2
    assert(!Files.exists(Paths.get(dir, "d=2")))
    assert(!Files.exists(Paths.get(dir, ".old_d=2")),
      "delete-all must clear the stale rollback copy, or recovery resurrects it")
    // next batch touches a DIFFERENT partition; recovery must not revive d=2
    mergeBatch(Seq((3L, 1, "U", 30.0, 1L)), dir)
    assert(readSnap(dir) == Map(1L -> (1, 10.0), 3L -> (1, 30.0)),
      "deleted partition must stay deleted across subsequent batches")
  }

  test("partitioned crash window on one partition is recovered, others untouched") {
    val dir = s"target/test-tmp/cdc-partcrash-${System.nanoTime()}"
    mergeBatch(Seq((1L, 1, "U", 10.0, 1L), (2L, 2, "U", 20.0, 1L)), dir)
    // simulate a crash between swapSnapshot's two moves on d=2: live gone,
    // retired copy at .old_d=2
    Files.move(Paths.get(dir, "d=2"), Paths.get(dir, ".old_d=2"))
    // the next batch (touching d=2) must merge against the RECOVERED base
    mergeBatch(Seq((3L, 2, "U", 30.0, 1L)), dir)
    assert(readSnap(dir) == Map(1L -> (1, 10.0), 2L -> (2, 20.0), 3L -> (2, 30.0)),
      "prior rows of the crashed partition must survive recovery")
  }

  test("partitioned upsert refuses null and unsafe partition values") {
    import spark.implicits._
    val dir = s"target/test-tmp/cdc-null-${System.nanoTime()}"
    val nullDf = Seq((1L, "U", 1.0, 1L)).toDF("k", "op", "v", "ver")
      .withColumn("d", org.apache.spark.sql.functions.lit(null).cast("string"))
    intercept[IllegalArgumentException] {
      StreamOps.mergeBatchPartitioned(nullDf, dir,
        Seq("k"), "op", Seq("ver"), "d")
    }
    val badDf = Seq((1L, "a b/c", "U", 1.0, 1L)).toDF("k", "d", "op", "v", "ver")
    intercept[IllegalArgumentException] {
      StreamOps.mergeBatchPartitioned(badDf, dir,
        Seq("k"), "op", Seq("ver"), "d")
    }
  }

  test("cdcUpsertPartitioned end-to-end over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = s"target/test-tmp/cdc-part-e2e-${System.nanoTime()}"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, String, Double, Long)]
    val changes = in.toDF().toDF("k", "d", "op", "v", "ver")
    val q = StreamOps.cdcUpsertPartitioned(changes, dir,
      keys = Seq("k"), opCol = "op", version = Seq("ver"), partitionKey = "d")
    in.addData((1L, 1, "U", 10.0, 1L), (2L, 2, "U", 20.0, 1L))
    q.processAllAvailable()
    val d1Before = fileBytes(Paths.get(dir, "d=1"))
    in.addData((2L, 2, "U", 21.0, 2L), (3L, 3, "U", 30.0, 1L))
    q.processAllAvailable()
    q.stop()
    assert(fileBytes(Paths.get(dir, "d=1")) == d1Before)
    assert(readSnap(dir) == Map(1L -> (1, 10.0), 2L -> (2, 21.0), 3L -> (3, 30.0)))
  }

  test("partitioned sink equals the whole-snapshot merge over random batch sequences") {
    import spark.implicits._
    // deterministic pseudo-random changelog: 6 batches of mixed
    // upserts/deletes over 40 keys spread across 4 partitions, applied
    // through BOTH the partition-scoped sink and a reference in-memory
    // fold of CdcMerge semantics (latest version wins per key, D deletes)
    val dir = s"target/test-tmp/cdc-equiv-${System.nanoTime()}"
    def h(i: Long, j: Long): Long = {
      var x = i * 2654435761L + j * 40503L
      x ^= (x >>> 16); x * 0x9E3779B97F4A7C15L >>> 33
    }
    var expected = Map.empty[Long, (Int, Double)] // k -> (d, v)
    (0 until 6).foreach { b =>
      val rows = (0 until 25).map { j =>
        val k = h(b, j) % 40
        val d = (k % 4).toInt                  // partition derived from key
        val op = if (h(b, j * 7 + 1) % 5 == 0) "D" else "U"
        val v = (h(b, j * 13 + 2) % 1000).toDouble
        (k, d, op, v, b.toLong * 100 + j)      // strictly increasing ver
      }
      // reference: apply latest-change-per-key within the batch
      rows.groupBy(_._1).foreach { case (k, ch) =>
        val latest = ch.maxBy(_._5)
        if (latest._3 == "D") expected -= k
        else expected += k -> (latest._2, latest._4)
      }
      StreamOps.mergeBatchPartitioned(
        rows.toDF("k", "d", "op", "v", "ver"), dir,
        keys = Seq("k"), opCol = "op", version = Seq("ver"), partitionKey = "d")
    }
    assert(readSnap(dir) == expected,
      "partition-scoped application must equal the reference merge fold")
  }

  test("cdcUpsert end-to-end: snapshot survives an injected crash window between batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = s"target/test-tmp/cdc-crash-${System.nanoTime()}"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double, Long)]
    val changes = in.toDF().toDF("k", "op", "v", "ver")
    val q = StreamOps.cdcUpsert(changes, dir,
      keys = Seq("k"), opCol = "op", version = Seq("ver"))
    in.addData((1L, "U", 10.0, 1L), (2L, "U", 20.0, 1L))
    q.processAllAvailable()
    // inject the crash window: live snapshot renamed to .old, live gone —
    // exactly the state a crash between swapSnapshot's two moves leaves
    Files.move(Paths.get(dir), Paths.get(dir + ".old"))
    // next batch must recover .old as its base, not start from empty
    in.addData((3L, "U", 30.0, 1L))
    q.processAllAvailable()
    q.stop()
    val snap = spark.read.parquet(dir)
      .select($"k", $"v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snap == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0),
      s"prior snapshot must survive the crash window, got $snap")
  }
}
