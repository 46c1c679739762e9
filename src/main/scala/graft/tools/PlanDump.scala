package graft.tools
import org.apache.spark.sql.SparkSession
/** Print the executed plan of named SparkEntry queries — the quick way
  * to eyeball pushdown/broadcast/exchange shape before writing a
  * PlanSpec pin. Args: query names. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
