package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: lay documents end-to-end (in a deterministic order)
  * and cut the token stream into fixed-size context windows — the
  * GPT-style "concat and chunk" batching step that turns a curated corpus
  * into training sequences. The output maps every window to the documents
  * that contribute tokens to it (for provenance / loss masking).
  *
  * Packing a single global stream is inherently sequential, so it is done
  * PER SHARD (the `shard` column — language, source, or an explicit
  * bucket): each shard's stream is independent, which is both the
  * standard practice (shards are shuffled at training time anyway) and
  * the scale story — one window-cumsum per shard partition, no global
  * ordering. Shards are only as parallel as their count; for a 100 TB
  * corpus shard by file/bucket (thousands of shards), never by a
  * low-cardinality column.
  */
object SeqPack {

  /** One row per (shard, window): how many docs contribute, how many
    * tokens land in the window (= `windowTokens` except each shard's
    * last), and the contributing doc-id range. `nTokens` is the doc's
    * token count; docs with zero tokens are dropped (they occupy no
    * window). Window boundaries are deterministic: docs are laid out in
    * ascending `id` order within each shard. */
  def windows(docs: DataFrame, shard: Column, id: Column, nTokens: Column,
              windowTokens: Int): DataFrame = {
    // ROWS frame (not the default RANGE): duplicate doc_ids within a
    // shard must each advance the layout cursor, matching the oracle's
    // explicit ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val laid = docs
      .select(shard.as("shard"), id.as("doc_id"), nTokens.cast(LongType).as("n"))
      .filter(col("n") > 0)
      .withColumn("end_pos", sum(col("n")).over(w))
      .withColumn("start_pos", col("end_pos") - col("n"))
    // a doc spanning [start, end) touches windows floor(start/W)..floor((end-1)/W);
    // the explode is row-local and bounded by ceil(n / W) + 1 windows per doc
    val wt = lit(windowTokens.toLong)
    val exploded = laid.select(col("shard"), col("doc_id"),
        col("start_pos"), col("end_pos"),
        explode(sequence(floor(col("start_pos") / wt),
          floor((col("end_pos") - 1) / wt))).as("window_id"))
      .withColumn("contrib",
        least(col("end_pos"), (col("window_id") + 1) * wt) -
          greatest(col("start_pos"), col("window_id") * wt))
    exploded.groupBy(col("shard"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contrib")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }
}
