package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sorted-merge intersection kernel must agree with
  * size(array_intersect(...)) on every input pair once both arrays are
  * UTF8-sorted — the law AllPairs verification rides on. */
class SetKernelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("sortedIntersectSize == size(array_intersect) on sorted arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val a = Seq.fill(rnd.nextInt(40))(s"t${rnd.nextInt(60)}").distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(s"t${rnd.nextInt(60)}").distinct.sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select($"id",
        plans.SetKernels.sortedIntersectSize($"a", $"b").as("k"),
        size(array_intersect($"a", $"b")).as("ref"))
    assert(df.filter($"k" =!= $"ref").count() == 0)
    // empty and disjoint edges
    val edge = Seq(
      (1L, Seq.empty[String], Seq("x")),
      (2L, Seq("a", "b"), Seq.empty[String]),
      (3L, Seq("a", "b"), Seq("c", "d"))).toDF("id", "a", "b")
      .select(plans.SetKernels.sortedIntersectSize($"a", $"b").as("k"))
      .collect().map(_.getInt(0)).toSeq
    assert(edge == Seq(0, 0, 0))
  }

  test("null array elements are rejected loudly, not NPE'd (r16 guard)") {
    val ex = intercept[Exception] {
      Seq((Seq(null.asInstanceOf[String], "z"), Seq("a")))
        .toDF("a", "b")
        .select(plans.SetKernels.sortedIntersectSize($"a", $"b").as("k"))
        .collect()
    }
    // the kernel's IllegalArgumentException may arrive wrapped in
    // Spark's task-failure chain; the message must survive
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null array element")))
  }

  test("long kernel: nullable-typed inputs take the checked path (r16)") {
    // Option[Long] elements give ArrayType(LongType, containsNull=true)
    // — the parquet-read shape. Null-free values must intersect exactly
    // as the fast path; a genuine null slot must throw loudly.
    val ok = Seq((Seq[Option[Long]](Some(1L), Some(3L), Some(7L)),
        Seq[Option[Long]](Some(3L), Some(7L), Some(9L))))
      .toDF("a", "b")
      .select(plans.SetKernels.sortedIntersectLongs($"a", $"b").as("w"))
      .collect().head.getSeq[Long](0)
    assert(ok == Seq(3L, 7L))
    val ex = intercept[Exception] {
      Seq((Seq[Option[Long]](None, Some(5L)), Seq[Option[Long]](Some(5L))))
        .toDF("a", "b")
        .select(plans.SetKernels.sortedIntersectLongs($"a", $"b").as("w"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null array element")))
  }
}
