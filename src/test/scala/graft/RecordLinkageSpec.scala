package graft

import graft.operators.RecordLinkage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecordLinkageSpec extends AnyFunSuite with SparkSpec {

  private def parts(rows: (Long, String, String, String, Int)*) = {
    import spark.implicits._
    rows.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
  }

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.select(col("p_partkey").as("id"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"),
      split(col("p_name"), " ").getItem(0).as("tok0"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-pass blocking: a pair missed by one pass survives via the other") {
    // Pass A blocks on (tok0, brand): rows 1 and 2 differ in brand so
    // pass A never pairs them; pass B (type, size) does.
    val df = parts(
      (1L, "red widget", "B1", "ECONOMY", 5),
      (2L, "red widget", "B2", "ECONOMY", 5))
    val cand = RecordLinkage.blockedCandidates(keyed(df), "id",
      Seq(Seq("tok0", "p_brand"), Seq("p_type", "p_size")),
      sortCol = "p_name", maxBlockRows = 1000)
    assert(pairSet(cand) == Set((1L, 2L)))
  }

  test("hot blocks degrade to sorted-neighborhood, small blocks stay pairwise") {
    // 5 same-key rows with cap 4 -> only adjacent (name, id) neighbors
    // pair (4 pairs, not C(5,2)=10); the separate 2-row block is
    // unaffected and yields its full (single) pair.
    val big = (1L to 5L).map(i => (i, "hot gear", "B1", "SMALL", 9))
    val small = Seq((10L, "blue bolt", "B2", "LARGE", 3),
      (11L, "blue bolt", "B2", "LARGE", 3))
    val df = parts((big ++ small): _*)
    val cand = RecordLinkage.blockedCandidates(keyed(df), "id",
      Seq(Seq("tok0", "p_brand")), sortCol = "p_name", maxBlockRows = 4)
    assert(pairSet(cand) ==
      Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
  }

  test("candidate union is deduplicated across passes") {
    val df = parts(
      (1L, "red widget", "B1", "ECONOMY", 5),
      (2L, "red widget", "B1", "ECONOMY", 5))
    // both passes block this pair together; the union must emit it once
    val cand = RecordLinkage.blockedCandidates(keyed(df), "id",
      Seq(Seq("tok0", "p_brand"), Seq("p_type", "p_size")),
      sortCol = "p_name", maxBlockRows = 1000)
    assert(cand.count() == 1)
  }

  test("linkParts scores exact-name same-brand close-size pairs at 1.0") {
    val df = parts(
      (1L, "red widget", "B1", "ECONOMY", 5),
      (2L, "red widget", "B1", "ECONOMY", 5),
      (3L, "small ring", "B9", "LARGE", 40))
    val out = RecordLinkage.linkParts(df, threshold = 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getDouble(2) == 1.0) // name_sim
    assert(r.getDouble(3) == 1.0) // score
  }

  test("scoring is blocking-local: unblocked near-identical pair is not scored") {
    // identical names but different brand AND different (type, size):
    // no pass blocks them, so no candidate — the documented recall
    // contract of blocked linkage.
    val df = parts(
      (1L, "red widget", "B1", "ECONOMY", 5),
      (2L, "red widget", "B2", "SMALL", 30))
    assert(RecordLinkage.linkParts(df, threshold = 0.0).count() == 0)
  }

  test("degraded pass work is linear: candidates ~= block size, not block^2") {
    import spark.implicits._
    // one hot key of 2000 rows -> exactly 1999 neighbor candidates
    val df = parts((1L to 2000L).map(i => (i, "red widget", "B1", "ECONOMY", 5)): _*)
    val cand = RecordLinkage.blockedCandidates(keyed(df), "id",
      Seq(Seq("tok0", "p_brand")), sortCol = "p_name", maxBlockRows = 256)
    assert(cand.count() == 1999L)
  }
}
