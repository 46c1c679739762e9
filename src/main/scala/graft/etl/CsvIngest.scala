package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-zone CSV ingestion, Spark-first.
  *
  * Re-expresses the reference's raw→conformed read step
  * (lib/glue_scripts/etl_raw_to_conformed.py:180-185): header'd,
  * delimiter-configurable CSV with schema inference and malformed-row
  * dropping.
  *
  * Scale note: `inferSchema=true` is a convenience for the raw zone only —
  * it costs an extra pass over the data. At 100 TB, pass `schema=Some(...)`
  * (declared from the catalog, see [[CatalogRegistry]]) so the scan is
  * single-pass and the parse errors go through DROPMALFORMED instead of
  * producing corrupt rows.
  */
object CsvIngest {
  final case class Options(
      header: Boolean = true,
      delimiter: String = ",",
      inferSchema: Boolean = true,
      dropMalformed: Boolean = true,
      schema: Option[org.apache.spark.sql.types.StructType] = None)

  def read(spark: SparkSession, path: String, opts: Options = Options()): DataFrame = {
    var r = spark.read
      .option("header", opts.header.toString)
      .option("delimiter", opts.delimiter)
      .option("mode", if (opts.dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
    r = opts.schema match {
      case Some(s) => r.schema(s)
      case None    => r.option("inferSchema", opts.inferSchema.toString)
    }
    r.csv(path)
  }
}
