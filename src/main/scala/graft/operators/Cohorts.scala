package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention matrix over an event stream — the longitudinal
  * complement to [[ChurnLabels]]' point labels and [[Survival]]'s
  * hazard curve: users are bucketed by their FIRST-SEEN period
  * (cohort), and each later period records what fraction of that
  * cohort was still active. The triangular (cohort, offset) matrix is
  * how product/data teams separate "the product is retaining better"
  * from "we acquired a different mix" — a drop along a ROW is cohort
  * decay; a drop along a COLUMN is a regression affecting everyone.
  *
  * Semantics: period = whole weeks since `origin` (exact integer
  * arithmetic on epoch days); cohort(u) = period of u's earliest
  * event; for every (u, period) with an event, offset = period −
  * cohort(u) ≥ 0. retention = active/cohort_size.
  *
  * Exactness: periods and offsets are exact integers, counts BIGINTs,
  * retention one closing division, 6-dp.
  *
  * Scale shape: one distinct onto the (user, period) grid and one
  * per-user min — both map-side-combined on the SAME user-keyed
  * Exchange — then a broadcast-joinable cohort table closes onto the
  * periods² triangular grid. Per-user state is one integer; no
  * windows, no event-list state. */
object Cohorts {

  /** (cohort_week, week_offset, cohort_users, active_users, retention),
    * ordered by (cohort_week, week_offset). */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                origin: String): DataFrame = {
    val week = floor(datediff(to_date(col(tsCol)), to_date(lit(origin)))
      .cast("long") / 7L)
    // ONE corpus pass: the (user, week) activity set pins (it feeds the
    // cohort derivation AND the offset join — the naive plan re-scanned
    // the corpus 3x with no ReusedExchange); the weeks-squared result
    // re-emits driver-side so the pin releases before returning
    val spark = events.sparkSession
    Pinned.withCheckpoint(
      events.filter(col(tsCol).isNotNull)
        .select(col(userCol).as("__u"), week.as("__w"))
        .filter(col("__w") >= 0)
        .distinct()
    ) { activity =>
      val cohort = activity.groupBy(col("__u"))
        .agg(min(col("__w")).as("__c"))
      val sizes = cohort.groupBy(col("__c"))
        .agg(count(lit(1)).as("cohort_users"))
      val out = activity.join(cohort, "__u")
        .groupBy(col("__c"), (col("__w") - col("__c")).as("week_offset"))
        .agg(count(lit(1)).as("active_users"))
        .join(sizes, "__c")
        .select(col("__c").as("cohort_week"), col("week_offset"),
          col("cohort_users"), col("active_users"),
          round(col("active_users").cast("double") /
            col("cohort_users").cast("double"), 6).as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
      Grids.collectBounded(out, "retention cohort-week grid")
    }
  }
}
