package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) with multi-pass blocking.
  *
  * The classic Fellegi–Sunter shape re-expressed Spark-first: candidate
  * generation never compares all pairs — each blocking pass is a plain
  * equi-self-join on a cheap derived key, so the only shuffles are
  * hash-partitioned on the block keys and every comparison is
  * block-local. Multiple redundant passes (the standard ER recipe) trade
  * a second cheap shuffle for recall a single key can't give: a pair is
  * a candidate if ANY pass blocks it together, and the pass union is
  * deduplicated before the (more expensive) field scoring runs.
  *
  * Scale levers, in the order they matter at 100 TB:
  *  - block-size cap: a degenerate key value ("", "unknown") would turn
  *    its block quadratic; blocks over `maxBlockRows` are dropped from
  *    candidate generation (counted per pass with one aggregate — the
  *    documented ER "block purging" rule). Recall lost to a purged block
  *    is recoverable by the OTHER pass, which is exactly why multi-pass
  *    blocking is the production shape.
  *  - scoring stays in the scan stage: field similarities are codegen'd
  *    Column expressions (trigram Jaccard runs in the 64-bit shingle-hash
  *    domain — value-equal to string-set Jaccard, no per-pair strings).
  *  - the attribute fetch joins are plain hash joins on the id — at index
  *    scale you'd bucket both sides by id and the joins are co-located.
  *
  * Reference analogue: none (the reference dedupes whole rows only);
  * this is the LLM-pipeline / MDM operator the brief's training-data
  * families call for, with semantics pinned by a brute-force SQL oracle.
  */
object RecordLinkage {

  /** Within-block (idA < idB) candidate pairs for ONE blocking key,
    * skipping blocks larger than `maxBlockRows`. */
  private def passPairs(rows: DataFrame, id: String, key: Seq[String],
                        maxBlockRows: Int): DataFrame = {
    val keep = rows.groupBy(key.map(col): _*).count()
      .filter(col("count") <= maxBlockRows)
      .select(key.map(col): _*)
    val blocked = rows.join(keep, key)  // purge oversized blocks
    val a = key.map(col) :+ col(id).as("id_a")
    val b = key.map(col) :+ col(id).as("id_b")
    blocked.select(a: _*).join(blocked.select(b: _*), key)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** Candidate pairs = union over blocking passes, deduplicated. */
  def blockedCandidates(rows: DataFrame, id: String,
                        passes: Seq[Seq[String]],
                        maxBlockRows: Int): DataFrame =
    passes.map(passPairs(rows, id, _, maxBlockRows))
      .reduce(_ unionAll _)
      .distinct()

  /** Blocked linkage over the `part` table: passes on (name's first
    * token, brand) and (type, size); score = 0.6·trigram-Jaccard(name)
    * + 0.2·[brand equal] + 0.2·size-closeness. Returns pairs with
    * score >= threshold. */
  def linkParts(parts: DataFrame, threshold: Double,
                maxBlockRows: Int = 1000): DataFrame = {
    val rows = parts.select(
      col("p_partkey").as("id"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"),
      split(col("p_name"), " ").getItem(0).as("tok0"))
    val cand = blockedCandidates(rows, "id",
      Seq(Seq("tok0", "p_brand"), Seq("p_type", "p_size")), maxBlockRows)
    // attribute fetch + scoring; shingles computed per side (scan stage)
    def side(suffix: String) = rows.select(
      col("id").as(s"id_$suffix"),
      Dedup.charShingleHashes(col("p_name"), 3).as(s"sh_$suffix"),
      col("p_brand").as(s"brand_$suffix"),
      col("p_size").as(s"size_$suffix"))
    val jac = Dedup.jaccardHashed(col("sh_a"), col("sh_b"))
    val score =
      lit(0.6) * jac +
      lit(0.2) * when(col("brand_a") === col("brand_b"), 1.0).otherwise(0.0) +
      lit(0.2) * greatest(lit(0.0),
        lit(1.0) - abs(col("size_a") - col("size_b")) / lit(10.0))
    cand.join(side("a"), "id_a").join(side("b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jac, 6).as("name_sim"), round(score, 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
