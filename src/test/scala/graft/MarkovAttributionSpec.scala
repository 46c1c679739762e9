package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Markov removal-effect attribution on journeys with closed-form
  * absorption probabilities. */
class MarkovAttributionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** events dir from (user_id, Seq(event_type)) journeys. */
  private def eventsDir(journeys: Seq[(Long, Seq[String])]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("markov_").toString
    journeys.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case (t, i) =>
        (u * 1000L + i, // event_id
          Timestamp.valueOf(f"2024-01-05 10:${i}%02d:00"), u, t)
      }
    }.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("closed-form journeys: p=0.75, removal 2/3 vs 1/3, unused channels 0") {
    // 10 users view->purchase, 5 users click->purchase, 5 users click
    // only: P(START->view)=P(START->click)=1/2, P(CONV|view)=1,
    // P(CONV|click)=1/2 => p_base = 3/4; removing view leaves 1/4
    // (removal 2/3), removing click leaves 1/2 (removal 1/3)
    val journeys =
      (1L to 10L).map(u => u -> Seq("view", "purchase")) ++
        (11L to 15L).map(u => u -> Seq("click", "purchase")) ++
        (16L to 20L).map(u => u -> Seq("click"))
    val r = SparkEntry.queries("q_markov_attribution")(
      spark, eventsDir(journeys)).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("view").getAs[Long]("p_conv_ppm") == 750000L)
    assert(r("view").getAs[Long]("removal_ppm") == 666667L)
    assert(r("click").getAs[Long]("removal_ppm") == 333334L)
    assert(r("error").getAs[Long]("removal_ppm") == 0L)
    assert(r("signup").getAs[Long]("removal_ppm") == 0L)
    // shares split 2:1 between the two live channels
    assert(r("view").getAs[Long]("share_ppm") == 666666L)
    assert(r("click").getAs[Long]("share_ppm") == 333333L)
  }

  test("a conversion-blocking channel carries all the credit") {
    // every conversion flows through signup
    val journeys =
      (1L to 8L).map(u => u -> Seq("view", "signup", "purchase")) ++
        (9L to 12L).map(u => u -> Seq("view"))
    val r = SparkEntry.queries("q_markov_attribution")(
      spark, eventsDir(journeys)).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("signup").getAs[Long]("removal_ppm") == 1000000L)
    assert(r("click").getAs[Long]("removal_ppm") == 0L)
    // view is also on every converting path: full removal too
    assert(r("view").getAs[Long]("removal_ppm") == 1000000L)
  }

  test("real-data invariants: removal bounded, shares sum to ~1e6") {
    val rows = SparkEntry.queries("q_markov_attribution")(spark, sf)
      .collect()
    assert(rows.length == 4)
    val pb = rows.head.getAs[Long]("p_conv_ppm")
    rows.foreach { r =>
      assert(r.getAs[Long]("p_conv_ppm") == pb, "base constant across rows")
      assert(r.getAs[Long]("p_without_ppm") <= pb,
        "removing a channel cannot raise conversion")
      val rem = r.getAs[Long]("removal_ppm")
      assert(rem >= 0L && rem <= 1000000L)
    }
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(shares - 1000000L) <= 4L, s"shares sum $shares")
  }
}
