package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw→conformed normalization steps.
  *
  * Mirrors the semantics of lib/glue_scripts/etl_raw_to_conformed.py:
  *  - NullType columns cast to string (lines 200-213);
  *  - decimal(10,0) normalized to int for the registered schema
  *    (lines 103-105);
  *  - `year`/`month`/`day` string partition columns injected
  *    (`add_partition`, lines 163-173 — the reference takes them from job
  *    args; graft derives them from an event-date column, which is what the
  *    args encode upstream).
  *
  * All transforms are pure Column expressions — they stay inside
  * whole-stage codegen and add no shuffle.
  */
object Conform {

  /** Cast any NullType (all-null inferred) columns to string. */
  def castNullColumns(df: DataFrame): DataFrame = {
    val nullCols = df.schema.fields.collect { case f if f.dataType == NullType => f.name }
    nullCols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(StringType)))
  }

  /** Catalog-facing type normalization: decimal(10,0)→int, null→string,
    * timestamp_ntz→timestamp (Glue/Hive catalogs carry a single timestamp
    * type; the NTZ/LTZ distinction is a reader concern, not a catalog
    * one — raw_to_conformed.py:103-110 normalizes types the same way). */
  def normalizeType(dt: DataType): DataType = dt match {
    case d: DecimalType if d.precision == 10 && d.scale == 0 => IntegerType
    case NullType                                            => StringType
    case TimestampNTZType                                    => TimestampType
    case other                                               => other
  }

  /** Inject zero-padded `year`/`month`/`day` string partition columns
    * derived from `dateCol`. String-typed to match the reference's
    * partition keys (etl_raw_to_conformed.py:129-133). */
  def injectDatePartitions(df: DataFrame, dateCol: Column): DataFrame =
    df.withColumn("year", year(dateCol).cast(StringType))
      .withColumn("month", lpad(month(dateCol).cast(StringType), 2, "0"))
      .withColumn("day", lpad(dayofmonth(dateCol).cast(StringType), 2, "0"))

  /** Stamp EVERY row of a run with the same `year`/`month`/`day` strings,
    * exactly as the reference's `add_partition` does with its
    * `p_year`/`p_month`/`p_day` job arguments
    * (etl_raw_to_conformed.py:163-173): a file spanning event dates still
    * lands wholly in the run's partition. Use [[injectDatePartitions]]
    * when partitions should follow a data column instead. */
  def injectStaticPartitions(df: DataFrame, year: String, month: String,
                             day: String): DataFrame =
    df.withColumn("year", lit(year))
      .withColumn("month", lit(month))
      .withColumn("day", lit(day))

  /** The reference's partition path `{year}/{month}/{day}`. */
  def partitionPath(df: DataFrame): DataFrame =
    df.withColumn("partition_path",
      concat_ws("/", col("year"), col("month"), col("day")))
}
