package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.io.Source

/** Purpose-built SQL transform runner.
  *
  * The reference's conformed→purpose-built job fetches a per-table SQL file
  * and executes it via `spark.sql` (etl_conformed_to_purposebuilt.py:180-199).
  * graft ships the SQL as classpath resources (the analogue of the
  * reference's `transformation-sql/` S3 prefix) and runs it against
  * registered views — fully declarative, so Catalyst owns the plan.
  */
object SqlTransform {
  def run(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** Load `<name>.sql` from the transformation-sql resource prefix —
    * the reference's `txn_sql_prefix_path + table_name + '.sql'` lookup. */
  def fromResource(spark: SparkSession, name: String): DataFrame = {
    val path = s"/graft/transformation-sql/$name.sql"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"no transformation SQL resource at $path")
    val sql = try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    run(spark, sql)
  }
}
