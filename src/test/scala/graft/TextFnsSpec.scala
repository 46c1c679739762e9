package graft

import graft.functions.TextFns
import graft.plans.RollingMinHash
import org.scalatest.funsuite.AnyFunSuite

class TextFnsSpec extends AnyFunSuite with SparkSpec {

  test("token counts on hand-built strings") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox",
      "  spaced   out  ",
      "mixed123 99 bottles!").toDF("text")
    val got = df.select(
      TextFns.whitespaceTokenCount($"text").as("ws"),
      org.apache.spark.sql.functions.size(TextFns.tokens($"text")).as("words"),
      TextFns.bpePieceCount($"text").as("pieces")).collect()
    assert(got(0).getLong(0) == 4 && got(0).getInt(1) == 4)
    assert(got(1).getLong(0) == 2 && got(1).getInt(1) == 2)
    // "mixed123 99 bottles!" → pieces: mixed,123,99,bottles,! = 5
    assert(got(2).getLong(2) == 5)
  }

  test("language id picks the list with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat and it is fine",
      "el gato es un animal y la casa es grande",
      "zzz qqq xxx").toDF("text")
    val got = df.select(TextFns.langId(TextFns.tokens($"text"))).collect()
    assert(got(0).getString(0) == "en")
    assert(got(1).getString(0) == "es")
    assert(got(2).getString(0) == "und")
  }

  test("quality ratios are bounded and deterministic") {
    import spark.implicits._
    val q = SparkEntry.queries("q_text_quality")(spark, sf)
    import org.apache.spark.sql.functions.col
    assert(q.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(q.filter(col("mean_wlen") <= 0).count() == 0)
  }

  test("rolling fingerprint matches a reference recomputation") {
    def reference(s: String, w: Int, base: Long): Option[Long] = {
      if (s.length < w) return None
      Some((0 to s.length - w).map { i =>
        (0 until w).map(j => s.charAt(i + j).toLong * math.pow(base, j).toLong).sum
      }.min)
    }
    val samples = Seq("hello world rolling hash", "abcdefgh", "short")
    samples.foreach { s =>
      val got = Option(RollingMinHash.fingerprint(s, 8, 31)).map(_.longValue())
      assert(got == reference(s, 8, 31), s"mismatch for '$s'")
    }
  }

  test("rolling fingerprint is shift-robust (winnowing property)") {
    // prefixing text leaves the minimum window hash reachable
    val base = "a stable core fragment that is long enough"
    val shifted = "PREFIX " + base
    val f1 = RollingMinHash.fingerprint(base, 8, 31).longValue()
    val f2 = RollingMinHash.fingerprint(shifted, 8, 31).longValue()
    // the min over windows of the shifted text can only be <= (more windows)
    assert(f2 <= f1)
  }
}
