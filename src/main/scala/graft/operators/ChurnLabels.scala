package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Churn-label construction — the supervised-label builder for
  * "will this user return within `horizonDays`?" models, built the
  * leakage-safe way: each ACTIVE user-day gets the gap to the user's
  * NEXT active day, and the label is purely a function of FUTURE
  * activity (gap > horizon, or no future activity at all), never of
  * same-day features. The right-censoring trap is handled explicitly:
  * a user-day within `horizonDays` of the observation end cannot be
  * labeled negative honestly (the future it needs wasn't observed), so
  * it gets `censored = true` and a NULL label rather than a silently
  * optimistic 0 — dropping or keeping censored rows becomes the
  * modeler's visible choice.
  *
  * All arithmetic is integer day math over the distinct (user, day)
  * activity table; the observation end is the corpus max day (one
  * broadcast aggregate).
  *
  * Scale shape: one distinct (user, day) aggregate + ONE
  * `Exchange(user)` window (lead over day) — user timelines are short
  * next to the corpus; no corpus-scale sort. */
object ChurnLabels {

  /** (user, day, next_gap_days — NULL if no future activity, churned —
    * NULL when censored, censored). */
  def labels(df: DataFrame, userCol: String, tsCol: String,
             horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, s"bad horizonDays=$horizonDays")
    val days = df
      .filter(col(tsCol).isNotNull)
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val endDay = days.agg(max(col("day")).as("__end")) // one row
    val w = Window.partitionBy(col("user")).orderBy(col("day"))
    days
      .withColumn("__next", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(endDay))
      .select(col("user"), col("day"),
        datediff(col("__next"), col("day")).as("next_gap_days"),
        // censored: the horizon window extends past the observed end AND
        // no return was seen inside it — the future is unknown, not absent
        (datediff(col("__end"), col("day")) < horizonDays &&
          (col("__next").isNull ||
            datediff(col("__next"), col("day")) > horizonDays)).as("censored"))
      .withColumn("churned",
        when(col("censored"), lit(null).cast("boolean"))
          .otherwise(col("next_gap_days").isNull ||
            col("next_gap_days") > horizonDays))
      .select(col("user"), col("day"), col("next_gap_days"),
        col("churned"), col("censored"))
  }
}
