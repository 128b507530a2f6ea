package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — the
  * nonparametric "what fraction survives past t" curve under RIGHT
  * CENSORING, the estimator that makes duration data honest: averaging
  * observed durations ignores censored users (who survived AT LEAST
  * their observation) and biases lifetime low. Pairs with
  * [[ChurnLabels]]: that operator builds the (duration, event) rows,
  * this one turns them into the retention curve product/tenure teams
  * actually read.
  *
  * Estimator: at each distinct EVENT time t with n_t at risk and d_t
  * events, S(t) = Π_{u ≤ t} (1 − d_u/n_u). All counts are exact
  * integers off one duration-grid aggregate; each factor is one
  * correctly-rounded double division and the product folds the grid
  * prefix IN DURATION ORDER (sorted-struct fold — the fixed-fold-order
  * rule), so the curve replays bit-for-bit in any engine. Censored
  * rows leave the risk set after their time (standard KM: a tie
  * between an event and a censoring at t counts the censored row as
  * still at risk for t's factor).
  *
  * Scale shape: ONE map-side-combined (duration → d, c) aggregate over
  * the cohort; everything after runs on the DURATION GRID (day-grid
  * bounded — the QuantileNorm grid contract: tenure in days is
  * calendar-bounded, not cohort-bounded). The prefix-product join is
  * grid², documented and bounded by the same argument. */
object Survival {

  /** (t, n_risk, n_events, n_censored, surv) — one row per distinct
    * EVENT time, ascending; `surv` is S(t) AFTER t's events. */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val rows = df.select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("boolean").as("__e"))
      .filter(col("__t").isNotNull && col("__t") >= 0 && col("__e").isNotNull)
    val grid = rows.groupBy(col("__t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("__c"))
    val n = grid.agg(coalesce(sum(col("__d") + col("__c")), lit(0L)).as("__n"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid
      .crossJoin(broadcast(n))
      .withColumn("__gone", sum(col("__d") + col("__c")).over(w))
      // at risk AT t = everyone not yet gone BEFORE t
      .withColumn("n_risk", col("__n") - col("__gone") + col("__d") + col("__c"))
    // prefix product over the grid (grid² join — duration grids are
    // day-bounded); factors fold in duration order
    val g2 = atRisk.filter(col("__d") > 0)
      .select(col("__t").as("__u"), col("__d").as("__du"), col("n_risk").as("__nu"))
    atRisk.filter(col("__d") > 0).as("g")
      .join(g2, col("__u") <= col("__t"))
      .groupBy(col("__t"))
      .agg(first(col("n_risk")).as("n_risk"), first(col("__d")).as("n_events"),
        first(col("__c")).as("n_censored"),
        array_sort(collect_list(struct(col("__u"),
          ((col("__nu") - col("__du")).cast("double") / col("__nu").cast("double"))
            .as("__f")))).as("__ps"))
      .select(col("__t").as("t"), col("n_risk"), col("n_events"), col("n_censored"),
        aggregate(expr("transform(__ps, p -> p.__f)"), lit(1.0),
          (acc, f) => acc * f).as("surv"))
      .orderBy(col("t"))
  }
}
