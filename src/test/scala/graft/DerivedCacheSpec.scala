package graft

import graft.operators.DerivedCache
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

/** The write-once derived-table primitive must (a) build exactly once
  * per key under concurrent callers, (b) tolerate a build that reads
  * ANOTHER derived table (the nested shape that crashed the
  * computeIfAbsent version with "Recursive update" on bin-colliding
  * keys), and (c) hand every caller the same rows. */
class DerivedCacheSpec extends AnyFunSuite with SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("builds exactly once per key under concurrent callers") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    val key = s"spec#concurrent-${System.nanoTime()}"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((1 to 8).map(_ => Future {
      rows(DerivedCache.table(spark, key) {
        builds.incrementAndGet()
        (1L to 100L).toDF("v")
      })
    })), 120.seconds)
    assert(builds.get() == 1, s"built ${builds.get()} times")
    assert(results.forall(_ == (1L to 100L).toSet))
  }

  test("a build may read another derived table (the nested shape)") {
    import spark.implicits._
    val tag = System.nanoTime()
    // many key pairs so SOME land in the same hash bin — the condition
    // that made nested computeIfAbsent throw "Recursive update"
    (1 to 20).foreach { i =>
      val inner = s"spec#inner-$tag-$i"
      val outer = s"spec#outer-$tag-$i"
      val out = DerivedCache.table(spark, outer) {
        val base = DerivedCache.table(spark, inner)((1L to 10L).toDF("v"))
        base.selectExpr("v * 2 as v")
      }
      assert(rows(out) == (1L to 10L).map(_ * 2).toSet)
    }
  }

  test("second call returns the written table without re-building") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    val key = s"spec#rebuild-${System.nanoTime()}"
    def get() = rows(DerivedCache.table(spark, key) {
      builds.incrementAndGet(); (1L to 5L).toDF("v")
    })
    assert(get() == get())
    assert(builds.get() == 1)
  }

  test("tableFor rebuilds when an input file changes, caches when it doesn't") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("derived-ver")
    val input = dir.resolve("t.txt")
    Files.writeString(input, "v1")
    val builds = new AtomicInteger(0)
    val key = s"spec#versioned-${System.nanoTime()}"
    def get() = rows(DerivedCache.tableFor(spark, key, Seq(input.toString)) {
      builds.incrementAndGet(); (1L to 5L).toDF("v")
    })
    get(); get()
    assert(builds.get() == 1, "unchanged input must hit the cache")
    // mutate the input: size changes -> new fingerprint -> rebuild
    Files.writeString(input, "v2-but-longer")
    get()
    assert(builds.get() == 2, "a changed input must trigger a rebuild")
    get()
    assert(builds.get() == 2)
    graft.Fs.deleteRec(dir)
  }
}
