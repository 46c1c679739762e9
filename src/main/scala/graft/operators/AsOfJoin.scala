package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join for time-keyed tables — the time-series
  * join Spark SQL lacks natively (pandas' merge_asof, DuckDB's ASOF JOIN,
  * kdb's aj).
  *
  * For every left row (key, t), attach the payload of the LATEST right row
  * of the same key with right.t <= t (inclusive); unmatched left rows keep
  * nulls (left-join semantics). Optional tolerance bounds the lookback.
  *
  * Scale design: the naive spelling is a non-equi range join — a per-row
  * probe that Spark plans as BroadcastNestedLoopJoin (quadratic, a
  * scale-killer). This operator instead UNIONS the two sides tagged,
  * hash-partitions by key, sorts each partition once by (time, side), and
  * takes a running `last(payload, ignoreNulls)` — one shuffle + one
  * spill-capable sort, O(n log n) total, no pairwise work. This is the
  * plan a native as-of operator would produce; composing it from
  * Window/union keeps Catalyst in charge (AQE, whole-stage codegen around
  * the window) with no custom exec needed.
  *
  * Determinism: ties on (key, time) between right rows are broken by
  * `rightTieBreak` (last one wins); right rows sort BEFORE left rows at
  * the same time, which is what makes the match inclusive.
  */
object AsOfJoin {

  /** @param payload       right columns to attach (null when unmatched)
    * @param rightTieBreak extra right ordering columns; the LAST row in
    *                      this order wins among equal (key, time)
    * @param tolerance     max lookback as a Spark interval expression
    *                      (e.g. "INTERVAL 1 HOUR"); matches older than
    *                      `t - tolerance` are nulled out
    * @param prefix        prepended to attached columns; the matched right
    *                      time is emitted as `{prefix}time` */
  def backward(left: DataFrame, right: DataFrame,
               keys: Seq[String], leftTime: String, rightTime: String,
               payload: Seq[String], rightTieBreak: Seq[String] = Nil,
               tolerance: Option[String] = None,
               prefix: String = "asof_"): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, payload, rightTieBreak,
      tolerance, prefix, forwardDir = false)

  /** Forward as-of join: for every left row (key, t), attach the payload
    * of the EARLIEST right row of the same key with right.t >= t
    * (inclusive) — "time to next event" (next purchase after a click,
    * next deploy after a commit). The exact mirror of [[backward]]: same
    * union + one-shuffle + one-sort shape, but the partition sorts
    * DESCENDING so the running last() sees the nearest FOLLOWING right
    * row; right rows still sort before left at the same instant (which
    * keeps the match inclusive), so the tie-break order within a right
    * timestamp is REVERSED relative to backward — the FIRST row in
    * `rightTieBreak` order wins. `tolerance` bounds the look-ahead:
    * matches later than `t + tolerance` are nulled out. */
  def forward(left: DataFrame, right: DataFrame,
              keys: Seq[String], leftTime: String, rightTime: String,
              payload: Seq[String], rightTieBreak: Seq[String] = Nil,
              tolerance: Option[String] = None,
              prefix: String = "asof_"): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, payload, rightTieBreak,
      tolerance, prefix, forwardDir = true)

  /** The ONE union + one-shuffle + one-sort core both directions share —
    * a fix here (tolerance nulling, payload attachment, tie handling)
    * reaches both lanes. Direction changes exactly three things:
    *  - the partition sort runs time-ASC (backward: "most recent prior"
    *    = last seen) or time-DESC (forward: "earliest following" = last
    *    seen in reverse); right rows sort before left at equal times in
    *    BOTH, which keeps the match inclusive of the instant;
    *  - the tie-break direction flips with the sort, so among equal
    *    right timestamps backward keeps the LAST row in rightTieBreak
    *    order and forward keeps the FIRST — explicit here instead of a
    *    scaladoc footnote;
    *  - the tolerance bound is a lookback (>= t − tol) or a look-ahead
    *    (<= t + tol). */
  private def asOf(left: DataFrame, right: DataFrame,
                   keys: Seq[String], leftTime: String, rightTime: String,
                   payload: Seq[String], rightTieBreak: Seq[String],
                   tolerance: Option[String], prefix: String,
                   forwardDir: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith(prefix)),
      s"left columns may not start with '$prefix'")

    // Right side, reshaped to the union schema: keys + sort/tag helpers +
    // null left payload + its own payload under the prefix.
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          col(rightTime).as(s"${prefix}time")) ++
        rightTieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"_tb$i") } ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"$prefix$c")): _*)
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast(right.schema(rightTime).dataType).as(s"${prefix}time")) ++
        rightTieBreak.zipWithIndex.map { case (c, i) =>
          lit(null).cast(right.schema(c).dataType).as(s"_tb$i") } ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"$prefix$c")): _*)

    val ord =
      if (forwardDir)
        Seq(col("_t").desc, col("_side").asc) ++
          rightTieBreak.indices.map(i => col(s"_tb$i").desc_nulls_first)
      else
        Seq(col("_t").asc, col("_side").asc) ++
          rightTieBreak.indices.map(i => col(s"_tb$i").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = (s"${prefix}time" +: payload.map(p => s"$prefix$p"))
      .foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }

    val matchedOk = tolerance match {
      case Some(t) if forwardDir =>
        col(s"${prefix}time").isNotNull &&
          col(s"${prefix}time") <= col("_t") + expr(t)
      case Some(t) =>
        col(s"${prefix}time").isNotNull &&
          col(s"${prefix}time") >= col("_t") - expr(t)
      case None => col(s"${prefix}time").isNotNull
    }
    val withTol = (s"${prefix}time" +: payload.map(p => s"$prefix$p"))
      .foldLeft(attached) { (df, c) =>
        df.withColumn(c, when(matchedOk, col(c))) }

    withTol.filter(col("_side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        (s"${prefix}time" +: payload.map(p => s"$prefix$p")).map(col): _*)
  }
}
