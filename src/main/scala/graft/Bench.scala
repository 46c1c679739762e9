package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Honesty rules (round-2 hardening):
  *  - every query materializes through the noop sink, not count() —
  *    count() lets Catalyst prune projected columns and drop sorts, which
  *    under-reports real work;
  *  - each query runs twice: `queries` holds the cold (first-use, includes
  *    codegen/JIT compile) times — the conservative headline `value` — and
  *    `queries_warm` the steady-state rerun;
  *  - failures are never swallowed into a fake timing: a failed query
  *    reports -1 AND its error in `errors`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/JIT/codegen-compiler startup so it isn't attributed
    // to whichever query happens to run first
    spark.range(1000000).selectExpr("sum(id * 2)", "count(distinct id % 100)").collect()

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, None)
      } catch { case e: Throwable =>
        ((System.nanoTime() - t0) / 1e9, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"))
      }
    }

    val cold = SparkEntry.queries.map { case (n, f) => n -> run(f) }
    val warm = SparkEntry.queries.map { case (n, f) => n -> run(f) }

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def times(m: Map[String, (Double, Option[String])]): String =
      m.map { case (k, (t, err)) =>
        s""""${esc(k)}":${if (err.isDefined) -1 else t}"""
      }.mkString("{", ",", "}")
    val errors = (cold ++ warm.filter { case (k, v) => v._2.isDefined && cold(k)._2.isEmpty })
      .collect { case (k, (_, Some(e))) => s""""${esc(k)}":"${esc(e)}"""" }
      .mkString("{", ",", "}")
    val total = cold.values.collect { case (t, None) => t }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${times(cold)},"queries_warm":${times(warm)},"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
