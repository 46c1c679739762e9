package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** In-engine table catalog.
  *
  * Re-expresses the reference's Glue catalog upsert
  * (etl_raw_to_conformed.py:90-160: create-database-if-absent,
  * create-or-update table with normalized column types, partition keys,
  * classification, table version) as a Spark-native registry: each upsert
  * registers a temp view for `spark.sql` access and records normalized
  * metadata that `toDF` exposes as a queryable table.
  *
  * On a cluster this would be `saveAsTable` against the configured
  * metastore; the metadata model (and the decimal(10,0)→int / null→string
  * normalization) is identical.
  */
class CatalogRegistry(spark: SparkSession) {
  final case class ColumnMeta(name: String, tpe: String)
  final case class TableMeta(
      database: String, table: String, columns: Seq[ColumnMeta],
      partitionKeys: Seq[String], classification: String,
      location: String, version: Int)

  private val tables = mutable.LinkedHashMap.empty[(String, String), TableMeta]
  private val databases = mutable.LinkedHashSet.empty[String]

  def createDatabaseIfAbsent(db: String): Unit = databases += db

  def tableExists(db: String, table: String): Boolean = tables.contains((db, table))

  /** Create-or-update: bumps version on update, like TableVersion in the
    * reference's TableInput. Partition-key columns are excluded from the
    * data column list (etl_conformed_to_purposebuilt.py:107). */
  def upsert(df: DataFrame, db: String, table: String,
             classification: String = "PARQUET",
             location: String = "",
             partitionKeys: Seq[String] = PartitionedWriter.DefaultPartitionKeys): TableMeta = {
    createDatabaseIfAbsent(db)
    val cols = df.schema.fields.toSeq
      .filterNot(f => partitionKeys.contains(f.name))
      .map(f => ColumnMeta(f.name, Conform.normalizeType(f.dataType).simpleString))
    val version = tables.get((db, table)).map(_.version + 1).getOrElse(0)
    val meta = TableMeta(db, table, cols, partitionKeys, classification, location, version)
    tables((db, table)) = meta
    df.createOrReplaceTempView(table)
    meta
  }

  /** The catalog as a queryable DataFrame (one row per column). */
  def toDF: DataFrame = {
    import spark.implicits._
    val rows = tables.values.toSeq.flatMap { t =>
      t.columns.zipWithIndex.map { case (c, i) =>
        (t.database, t.table, i, c.name, c.tpe, false, t.classification, t.version)
      } ++ t.partitionKeys.zipWithIndex.map { case (k, i) =>
        (t.database, t.table, t.columns.size + i, k, "string", true, t.classification, t.version)
      }
    }
    rows.toDF("database", "table_name", "ordinal", "column_name", "column_type",
      "is_partition_key", "classification", "table_version")
  }
}
