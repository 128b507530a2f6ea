package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM segmentation (Hughes 1994) — the classic customer-value census
  * the cohort/churn family reads next to ([[Cohorts]] says WHEN users
  * return, [[ChurnLabels]] says WHO left; RFM says WHO IS WORTH
  * keeping): per customer, Recency (days since last order at a pinned
  * as-of date), Frequency (order count), Monetary (exact decimal
  * spend), each scored into quintiles, then the standard named
  * segments off the (R, F) cell.
  *
  * Exactness: R/F are exact integers, M an exact DECIMAL sum; quintile
  * scores are NTILE(5) — SQL-standard equal-fill semantics, identical
  * across engines — over a TOTAL deterministic order (metric, then
  * customer id, ties broken identically everywhere). The summary's
  * monetary total converts decimal→double once.
  *
  * Scale shape: one map-side-combined aggregate onto the CUSTOMER
  * dimension (orders-of-magnitude smaller than the fact table), then
  * three ntile windows over that dimension — a dimension-table sort,
  * the same cost class as any dim build. At extreme customer counts
  * swap the ntile for boundary-based scoring off [[ExactQuantile]]
  * (approximate bucket-fill at the boundaries, same labels); the gate
  * keeps ntile for its exact SQL-replayable fill semantics. */
object Rfm {

  /** One row per (r_score, f_score, m_score) cell: (r_score, f_score,
    * m_score, segment, customers, monetary_total), ordered by scores.
    * Scores are 1..5, 5 best (most recent / most frequent / highest
    * spend). */
  def segments(orders: DataFrame, custCol: String, tsCol: String,
               amountCol: String, asOfDate: String): DataFrame = {
    val perCust = orders
      .filter(col(custCol).isNotNull && col(tsCol).isNotNull &&
        col(amountCol).isNotNull)
      .groupBy(col(custCol).as("__cust"))
      .agg(datediff(to_date(lit(asOfDate)), max(to_date(col(tsCol))))
          .cast("long").as("__rec"),
        count(lit(1)).as("__freq"),
        sum(col(amountCol).cast("decimal(18,2)")).cast("decimal(38,2)")
          .as("__mon"))
    // 5 = best: most recent (smallest recency), most orders, most spend
    val scored = perCust
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("__rec").desc, col("__cust").asc)))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("__freq").asc, col("__cust").asc)))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("__mon").asc, col("__cust").asc)))
    scored
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("customers"),
        sum(col("__mon")).cast("decimal(38,2)").as("__mt"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, lit("champions"))
          .when(col("f_score") >= 4, lit("loyal"))
          .when(col("r_score") >= 4, lit("recent"))
          .when(col("r_score") <= 2 && col("f_score") >= 3, lit("at_risk"))
          .otherwise(lit("hibernating")))
      .select(col("r_score"), col("f_score"), col("m_score"),
        col("segment"), col("customers"),
        col("__mt").cast("double").as("monetary_total"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }
}
