package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-wins compaction — the merge/upsert primitive of an
  * append-only lake: collapse a CDC/append history to the newest row per
  * business key (the batch form of what the reference's audit-trail
  * lambda does per-update in DynamoDB, generalized to any key/version).
  *
  * One shuffle on the key; with GraftExtensions installed the
  * row_number()=1 shape rewrites to the bounded TopKPerGroup operator
  * (k=1 heaps map-side), so the shuffle carries at most one candidate
  * row per key per input partition instead of the whole history. */
object Compaction {

  /** Newest row per `keys`, "newest" = greatest `version` tuple
    * (compared lexicographically; make it total for determinism). */
  def latestByKey(df: DataFrame, keys: Seq[Column], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(version.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
