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

  /** Cohort LTV curve — the REVENUE face of [[retention]]'s activity
    * matrix: customers bucket by the calendar month of their first
    * order, and each (cohort, age) cell carries the cohort's
    * CUMULATIVE revenue per acquired customer at that age. Retention
    * says "they came back"; this says what coming back was WORTH —
    * the curve whose plateau is the cohort's lifetime value, read per
    * cohort so an acquisition-mix change shows as a curve shift.
    *
    * Semantics: month index mi = year·12 + month (exact integers);
    * cohort(u) = min mi over u's orders; age = mi − cohort; cum
    * revenue runs over OBSERVED ages (a month with no orders adds no
    * row — the cum value at the next observed age is unchanged).
    *
    * Exactness: month arithmetic, cents sums and cumulative sums are
    * exact BIGINTs; ltv_cents = cum/cohort_n is the one closing
    * division, 6-dp.
    *
    * Scale shape: one per-customer min (map-side combined), one
    * customer-keyed join, one (cohort, age) aggregate; the cumsum
    * window runs per cohort on the calendar-bounded cells grid. */
  def cohortLtv(orders: DataFrame, custCol: String, dateCol: String,
                centsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = orders
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(centsCol).isNotNull)
      .select(col(custCol).as("__u"),
        (year(col(dateCol)) * 12 + month(col(dateCol))).cast("long")
          .as("__mi"),
        col(centsCol).cast("long").as("__v"))
    val spark = orders.sparkSession
    Pinned.withCheckpoint(u) { uu =>
      val cohort = uu.groupBy(col("__u")).agg(min(col("__mi")).as("__c"))
      val sizes = cohort.groupBy(col("__c"))
        .agg(count(lit(1)).as("cohort_customers"))
      val cells = uu.join(cohort, "__u")
        .groupBy(col("__c"), (col("__mi") - col("__c")).as("age_m"))
        .agg(count(lit(1)).as("orders_n"), sum(col("__v")).as("rev_cents"))
      val w = Window.partitionBy(col("__c")).orderBy(col("age_m"))
      val out = cells
        .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
        .join(sizes, "__c")
        .select(
          // integer month-index → yyyymm (Spark `/` on longs is double
          // division — floor keeps it exact; operands are positive)
          (floor((col("__c") - 1) / 12).cast("long") * 100 +
            ((col("__c") - 1) % 12) + 1).as("cohort_ym"),
          col("age_m"), col("cohort_customers"), col("orders_n"),
          col("rev_cents"), col("cum_rev_cents"),
          round(col("cum_rev_cents").cast("double") /
            col("cohort_customers").cast("double"), 6).as("ltv_cents"))
        .orderBy(col("cohort_ym"), col("age_m"))
      Grids.collectBounded(out, "cohortLtv cohort-month grid")
    }
  }
}
