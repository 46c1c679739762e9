package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level data profiling — the crawler/stats step of an ETL lake
  * (row counts, null counts, exact distinct cardinality, numeric
  * ranges), one output row per profiled column.
  *
  * Shape: a single aggregation pass over the table computes every
  * column's stats (multiple exact count(DISTINCT) rewrite through
  * Spark's Expand — one logical pass; at 100 TB swap the exact distincts
  * for approx_count_distinct and the plan collapses back to one real
  * scan), then a `stack` unpivots the one result row into per-column
  * rows. No joins, no per-column scans. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        (if (isNum) min(col(c)).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(s"${c}__min"),
        (if (isNum) max(col(c)).cast(DoubleType)
         else lit(null).cast(DoubleType)).as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ") + ")"
    one.select(col("__n"),
        expr(stackExpr).as(Seq("column_name", "n_nonnull", "n_distinct", "min_num", "max_num")))
      .select(col("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"),
        col("min_num"), col("max_num"))
  }
}
