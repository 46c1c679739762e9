package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Data-constrained epoch planning (the Muennighoff et al. 2023 regime:
  * when the corpus is smaller than the token budget, repeating data up
  * to ~4 epochs is near-free, beyond that returns decay): given a token
  * budget and a per-source token inventory, allocate each source a
  * UNIFORM share of the budget, fill it with whole epochs capped at
  * `maxEpochs`, and spend the remainder on a deterministic fractional
  * epoch — the prefix of the source's docs in a salted-md5 shuffle
  * order whose cumulative tokens fit.
  *
  * Everything is exact integer arithmetic (budget = `budgetEpochs` ×
  * total corpus tokens, shares by integer division), and the fractional
  * prefix is keyed by an md5 channel any engine replays — the planner's
  * output is a deterministic contract a sharded exporter can re-derive,
  * not a sample.
  *
  * Scale shape: the inventory is a map-side count/sum per source (tiny);
  * the only corpus-wide work is one window cumsum partitioned by source
  * for the fractional prefix — a single shuffle on the source key, run
  * once per training plan. A pathologically dominant source makes that
  * one partition large; the channel order is prefix-stable, so such a
  * source can be range-partitioned by channel prefix and scanned in
  * slices without changing the selection. */
object EpochPlan {

  /** Per-doc repeat counts under the plan: (source, doc_id, n_toks,
    * repeats) — full epochs for everyone in the source plus one extra
    * for the fractional md5-prefix. The EXECUTABLE form of [[plan]]:
    * exploding `repeats` yields exactly the planned token stream, so an
    * exporter materializes the plan instead of re-deriving it. */
  def docRepeats(docs: DataFrame, source: Column, id: Column,
                 nTokens: Column, budgetEpochs: Int = 2,
                 maxEpochs: Int = 4): DataFrame = {
    val d = docs.select(source.as("source"), id.as("doc_id"),
      nTokens.cast(LongType).as("n_toks"),
      md5(concat(lit("ep:"), id.cast(StringType))).as("ch"))
    val shares = sharesOf(d, budgetEpochs, maxEpochs)
    val w = Window.partitionBy(col("source")).orderBy(col("ch"), col("doc_id"))
    d.withColumn("cum", sum(col("n_toks")).over(w))
      .join(broadcast(shares.select(col("source"), col("full_epochs"),
        col("rem"))), Seq("source"))
      .select(col("source"), col("doc_id"), col("n_toks"),
        (col("full_epochs") +
          when(col("cum") <= col("rem"), 1L).otherwise(0L)).as("repeats"))
  }

  /** Per-source plan rows: (source, n_docs, n_tokens, full_epochs,
    * extra_docs, extra_tokens, planned_tokens). */
  def plan(docs: DataFrame, source: Column, id: Column, nTokens: Column,
           budgetEpochs: Int = 2, maxEpochs: Int = 4): DataFrame = {
    val d = docs.select(source.as("source"), id.as("doc_id"),
      nTokens.cast(LongType).as("n_toks"),
      md5(concat(lit("ep:"), id.cast(StringType))).as("ch"))
    val shares = sharesOf(d, budgetEpochs, maxEpochs)
    val w = Window.partitionBy(col("source")).orderBy(col("ch"), col("doc_id"))
    val extra = d.withColumn("cum", sum(col("n_toks")).over(w))
      .join(broadcast(shares.select(col("source"), col("rem"))), Seq("source"))
      .filter(col("cum") <= col("rem"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("extra_docs"), sum(col("n_toks")).as("extra_tokens"))
    shares.join(broadcast(extra), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("full_epochs"),
        coalesce(col("extra_docs"), lit(0L)).as("extra_docs"),
        coalesce(col("extra_tokens"), lit(0L)).as("extra_tokens"),
        (col("full_epochs") * col("n_tokens") +
          coalesce(col("extra_tokens"), lit(0L))).as("planned_tokens"))
  }

  /** The per-source budget shares — one definition feeding both the
    * report ([[plan]]) and the executable form ([[docRepeats]]), so
    * they can't drift. */
  private def sharesOf(d: DataFrame, budgetEpochs: Int,
                       maxEpochs: Int): DataFrame = {
    val bySrc = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val totals = bySrc.agg(sum(col("n_tokens")).as("tot"),
      count(lit(1)).as("k"))
    bySrc.crossJoin(broadcast(totals))
      .withColumn("target",
        expr(s"(tot * $budgetEpochs) div k"))
      .withColumn("full_epochs",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(least(lit(maxEpochs.toLong),
            expr("target div n_tokens"))))
      .withColumn("rem",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(least(col("target"), lit(maxEpochs.toLong) * col("n_tokens"))
            - col("full_epochs") * col("n_tokens")))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("full_epochs"), col("rem"))
  }
}
