package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kaplan–Meier survival estimation over right-censored durations —
  * the churn/retention curve (Kaplan & Meier 1958, "Nonparametric
  * estimation from incomplete observations", JASA 53). The analytics
  * sibling of q_cohort_retention: retention reports observed shares
  * per period, KM corrects them for subjects whose observation window
  * simply hasn't reached the period yet (censoring) — the estimator
  * every product-analytics and reliability pipeline reaches for.
  *
  * Input: one row per subject with an integer `duration` and an
  * `observed` flag (1 = the terminal event happened at `duration`,
  * 0 = right-censored: still alive when observation stopped).
  * Output: one row per distinct event time t with n_risk (subjects
  * with duration >= t), n_events (observed terminations at t), and
  * S(t) = prod_{t_j <= t} (1 - d_j / n_j).
  *
  * The product is a sequential left-fold — each step scales the
  * previous RESULT — so like q_ewma it cannot be a window frame over
  * inputs. Same recipe: the per-time table (one row per distinct
  * duration — bounded by the TIME DOMAIN, never subject count)
  * collapses to one row, a higher-order `aggregate` folds
  * S *= 1 - d/n left-to-right appending each step's S, and the fold
  * result explodes back to per-time rows. The oracle replays the
  * identical float-op sequence as a recursive CTE, so S(t)
  * hash-matches without tolerance.
  *
  * Scale shape: one shuffle groups subjects per duration (map-side
  * partial counts); the risk-set window and the fold run on the tiny
  * distinct-duration table (days in a year, not users in a corpus);
  * at 100 TB of events the subject derivation upstream dominates and
  * this estimator stays a post-aggregation epilogue. */
object Survival {

  /** KM curve from (duration, observed) subject rows. `duration` must
    * be a non-negative integer column; `observed` 1/0. */
  def kaplanMeier(subjects: DataFrame, duration: Column,
                  observed: Column): DataFrame = {
    // per distinct duration: d_t (observed events) and c_t (all ending)
    val perT = subjects
      .select(duration.cast(LongType).as("t"),
        observed.cast(LongType).as("obs"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_ending"), sum(col("obs")).as("n_events"))
    // risk set: subjects with duration >= t == suffix-sum of n_ending
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = perT
      .withColumn("n_risk", sum(col("n_ending")).over(wDesc))
      .filter(col("n_events") > 0) // KM steps only at event times
    // fold S *= 1 - d/n in ascending-t order, appending each step
    val folded = risked
      .groupBy()
      .agg(sort_array(collect_list(struct(
        col("t"), col("n_risk"), col("n_events")))).as("h"))
      .select(aggregate(col("h"),
        array().cast(ArrayType(StructType(Seq(
          StructField("t", LongType), StructField("n_risk", LongType),
          StructField("n_events", LongType),
          StructField("s", DoubleType))))),
        (acc, x) => {
          val prev = when(size(acc) === 0, lit(1.0))
            .otherwise(element_at(acc, -1)("s"))
          val step = lit(1.0) -
            x("n_events").cast(DoubleType) / x("n_risk").cast(DoubleType)
          concat(acc, array(struct(
            x("t").as("t"), x("n_risk").as("n_risk"),
            x("n_events").as("n_events"), (prev * step).as("s"))))
        }).as("curve"))
    folded
      .select(explode(col("curve")).as("p"))
      .select(col("p.t").as("t"), col("p.n_risk").as("n_risk"),
        col("p.n_events").as("n_events"),
        round(col("p.s"), 6).as("survival"))
  }
}
