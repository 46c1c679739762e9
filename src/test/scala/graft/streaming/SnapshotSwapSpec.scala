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
