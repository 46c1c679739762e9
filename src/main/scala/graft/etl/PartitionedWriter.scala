package graft.etl

import org.apache.spark.sql.DataFrame

/** Conformed/purpose-built zone writer.
  *
  * Mirrors etl_raw_to_conformed.py:191-216: dynamic partition overwrite +
  * `partitionBy(year, month, day)` parquet. Dynamic mode means a re-run of
  * one ingest date replaces only that date's partitions — at 100 TB the
  * write touches a single date directory, never the whole table.
  */
object PartitionedWriter {
  val DefaultPartitionKeys: Seq[String] = Seq("year", "month", "day")

  def write(df: DataFrame, location: String,
            partitionKeys: Seq[String] = DefaultPartitionKeys): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write
      .partitionBy(partitionKeys: _*)
      .format("parquet")
      .mode("overwrite")
      .save(location)
  }
}
