package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Arriving-file routing: derive the ETL job inputs from an object-store
  * key, as the reference's per-arrival trigger does
  * (state_machine_trigger/lambda_handler.py:65-80): the first path
  * segment is the source system (= target database name), the second the
  * table name; the directory part keeps partition-style `key=value`
  * segments (url-encoded `=` is decoded); the base name identifies the
  * file. Re-expressed as pure Column functions so a whole listing/event
  * feed routes in one scan — the driver-side twin is unnecessary, a
  * million arrival events are just rows.
  */
object Arrivals {

  /** First path segment: the source system / target database name. */
  def sourceSystem(key: Column): Column = split(key, "/").getItem(0)

  /** Second path segment: the table name. */
  def tableName(key: Column): Column = split(key, "/").getItem(1)

  /** Directory part with url-encoded '=' restored — partition dirs
    * (`year%3D2024`) become `year=2024`, matching the reference's
    * `%3D` replace (lambda_handler.py:77). */
  def fileDir(key: Column): Column =
    regexp_replace(
      // drop the last segment (the file name); keyless roots yield ''
      when(instr(key, "/") === 0, lit(""))
        .otherwise(regexp_replace(key, "/[^/]*$", "")),
      "%3D", "=")

  /** The file's base name ('' for directory-like keys). */
  def baseFileName(key: Column): Column =
    element_at(split(key, "/"), -1)

  /** One routing struct per arrival row: everything the conform job run
    * needs from the key. */
  def route(key: Column): Column = struct(
    sourceSystem(key).as("source_system"),
    tableName(key).as("table_name"),
    fileDir(key).as("file_dir"),
    baseFileName(key).as("base_file_name"))
}
