package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** In-engine table catalog.
  *
  * Re-expresses the reference's Glue catalog upsert
  * (etl_raw_to_conformed.py:90-160: create-database-if-absent,
  * create-or-update table with normalized column types, partition keys,
  * classification, storage descriptor, table version) as a Spark-native
  * registry:
  *
  *  - [[upsert]] registers a temp view for `spark.sql` access and records
  *    normalized metadata that [[toDF]] exposes as a queryable table;
  *  - [[upsertExternal]] additionally creates a REAL metastore table over
  *    a partitioned location and syncs its partitions via
  *    `spark.catalog.recoverPartitions` — the `ALTER TABLE … RECOVER
  *    PARTITIONS` both reference jobs end with
  *    (etl_raw_to_conformed.py:221, etl_conformed_to_purposebuilt.py:213).
  *    After a PartitionedWriter.write (or any out-of-band partition
  *    arrival), the table is queryable BY NAME with partition pruning.
  */
class CatalogRegistry(spark: SparkSession) {
  final case class ColumnMeta(name: String, tpe: String)

  /** Storage-descriptor fields, as in the reference's TableInput
    * (etl_raw_to_conformed.py:112-127). The Hive format/serde class names
    * are metadata strings recorded for catalog parity — Spark reads the
    * data through its own parquet source. */
  final case class StorageMeta(
      inputFormat: String, outputFormat: String, serdeLibrary: String,
      serializationFormat: String)

  final case class TableMeta(
      database: String, table: String, columns: Seq[ColumnMeta],
      partitionKeys: Seq[String], classification: String,
      location: String, storage: StorageMeta, version: Int)

  object StorageMeta {
    val Parquet: StorageMeta = StorageMeta(
      "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
      "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
      "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe",
      "1")
  }

  private val tables = mutable.LinkedHashMap.empty[(String, String), TableMeta]
  private val databases = mutable.LinkedHashSet.empty[String]

  def createDatabaseIfAbsent(db: String): Unit = databases += db

  def tableExists(db: String, table: String): Boolean = tables.contains((db, table))

  private def record(df: DataFrame, db: String, table: String,
                     classification: String, location: String,
                     partitionKeys: Seq[String]): TableMeta = {
    createDatabaseIfAbsent(db)
    val cols = df.schema.fields.toSeq
      .filterNot(f => partitionKeys.contains(f.name))
      .map(f => ColumnMeta(f.name, Conform.normalizeType(f.dataType).simpleString))
    val version = tables.get((db, table)).map(_.version + 1).getOrElse(0)
    val meta = TableMeta(db, table, cols, partitionKeys, classification,
      location, StorageMeta.Parquet, version)
    tables((db, table)) = meta
    meta
  }

  /** Create-or-update: bumps version on update, like TableVersion in the
    * reference's TableInput. Partition-key columns are excluded from the
    * data column list (etl_conformed_to_purposebuilt.py:107). */
  def upsert(df: DataFrame, db: String, table: String,
             classification: String = "PARQUET",
             location: String = "",
             partitionKeys: Seq[String] = PartitionedWriter.DefaultPartitionKeys): TableMeta = {
    val meta = record(df, db, table, classification, location, partitionKeys)
    df.createOrReplaceTempView(table)
    meta
  }

  /** Create-or-replace a metastore table over an existing partitioned
    * `location` and recover its partitions. The DROP does NOT touch data
    * (the table has an explicit LOCATION → external semantics), so
    * re-upserting after a schema change is safe; partition-key columns
    * are string-typed like the reference's partition_key list
    * (etl_raw_to_conformed.py:128-133). Call again (or just
    * [[recoverPartitions]]) after out-of-band partition writes. */
  def upsertExternal(df: DataFrame, db: String, table: String, location: String,
                     partitionKeys: Seq[String] = PartitionedWriter.DefaultPartitionKeys,
                     format: String = "parquet"): TableMeta = {
    require(partitionKeys.nonEmpty, "upsertExternal requires partition keys")
    val meta = record(df, db, table, format.toUpperCase, location, partitionKeys)
    val dataCols = df.schema.fields.toSeq
      .filterNot(f => partitionKeys.contains(f.name))
      .map(f => s"`${f.name}` ${Conform.normalizeType(f.dataType).sql}")
    val partCols = partitionKeys.map(k => s"`$k` STRING")
    val fq = s"`$db`.`$table`"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    spark.sql(
      s"""CREATE TABLE $fq (${(dataCols ++ partCols).mkString(", ")})
         |USING $format
         |PARTITIONED BY (${partitionKeys.map(k => s"`$k`").mkString(", ")})
         |LOCATION '$location'""".stripMargin)
    recoverPartitions(db, table)
    meta
  }

  /** Sync metastore partitions with the filesystem — `ALTER TABLE …
    * RECOVER PARTITIONS` (etl_raw_to_conformed.py:221). */
  def recoverPartitions(db: String, table: String): Unit =
    spark.catalog.recoverPartitions(s"`$db`.`$table`")

  /** The catalog as a queryable DataFrame (one row per column). */
  def toDF: DataFrame = {
    import spark.implicits._
    val rows = tables.values.toSeq.flatMap { t =>
      t.columns.zipWithIndex.map { case (c, i) =>
        (t.database, t.table, i, c.name, c.tpe, false, t.classification,
          t.storage.inputFormat, t.storage.outputFormat, t.storage.serdeLibrary, t.version)
      } ++ t.partitionKeys.zipWithIndex.map { case (k, i) =>
        (t.database, t.table, t.columns.size + i, k, "string", true, t.classification,
          t.storage.inputFormat, t.storage.outputFormat, t.storage.serdeLibrary, t.version)
      }
    }
    rows.toDF("database", "table_name", "ordinal", "column_name", "column_type",
      "is_partition_key", "classification", "input_format", "output_format",
      "serde_library", "table_version")
  }
}
