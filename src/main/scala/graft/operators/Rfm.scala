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

  /** Per-customer coarse segment at one as-of date — the scoring half
    * of [[segments]] re-expressed per customer, shared by the snapshot
    * cells and the [[migration]] cross-tab. Only orders strictly
    * BEFORE `asOfDate` count (the snapshot must not see the future). */
  private def segmentAt(orders: DataFrame, custCol: String, tsCol: String,
                        amountCol: String, asOfDate: String): DataFrame = {
    val perCust = orders
      .filter(col(custCol).isNotNull && col(tsCol).isNotNull &&
        col(amountCol).isNotNull &&
        to_date(col(tsCol)) < to_date(lit(asOfDate)))
      .groupBy(col(custCol).as("__cust"))
      .agg(datediff(to_date(lit(asOfDate)), max(to_date(col(tsCol))))
          .cast("long").as("__rec"),
        count(lit(1)).as("__freq"))
    perCust
      .withColumn("__r", ntile(5).over(
        Window.orderBy(col("__rec").desc, col("__cust").asc)))
      .withColumn("__f", ntile(5).over(
        Window.orderBy(col("__freq").asc, col("__cust").asc)))
      .select(col("__cust"),
        when(col("__r") >= 4 && col("__f") >= 4, lit("champions"))
          .when(col("__f") >= 4, lit("loyal"))
          .when(col("__r") >= 4, lit("recent"))
          .when(col("__r") <= 2 && col("__f") >= 3, lit("at_risk"))
          .otherwise(lit("hibernating")).as("__seg"))
  }

  /** RFM segment migration between two as-of snapshots — the FLOW face
    * of [[segments]]' static cells: each customer present at BOTH
    * cutoffs lands in exactly one (from, to) transition, and the
    * matrix says where the champions WENT (a stable champion count can
    * hide full churn-and-replace — visible only here). Customers with
    * no orders before the first cutoff are out of frame (they have no
    * "from"); the snapshot-A scoring sees only pre-A orders, so the
    * matrix never leaks the future into the past.
    *
    * Exactness: both snapshots score by deterministic NTILE over the
    * (metric, customer) total order; transition counts are exact
    * BIGINTs; the row share is one closing division.
    *
    * SEGMENTS ARE R/F-ONLY BY DESIGN (r16 advisor note): the coarse
    * segment rule (champions/loyal/recent/at_risk/hibernating) reads
    * recency and frequency alone — the same rule [[segments]] applies
    * to its 5×5×5 cells, where monetary shows up as the m_score axis,
    * not in the label. `amountCol` is still required here so that BOTH
    * faces qualify exactly the same rows (an order with a NULL amount
    * is out of frame in [[segments]] and must be out of frame in the
    * migration too, or the two surfaces disagree on who exists).
    *
    * Scale shape: two customer-dimension aggregates + NTILEs (the
    * q320 caveat: the dimension sorts, never the order corpus), one
    * customer-keyed join, one census onto the 5×5 segment grid. */
  def migration(orders: DataFrame, custCol: String, tsCol: String,
                amountCol: String, asOfA: String,
                asOfB: String): DataFrame = {
    require(asOfA < asOfB, s"migration: asOfA=$asOfA !< asOfB=$asOfB")
    val a = segmentAt(orders, custCol, tsCol, amountCol, asOfA)
      .withColumnRenamed("__seg", "segment_from")
    val b = segmentAt(orders, custCol, tsCol, amountCol, asOfB)
      .withColumnRenamed("__seg", "segment_to")
    val trans = a.join(b, "__cust")
      .groupBy(col("segment_from"), col("segment_to"))
      .agg(count(lit(1)).as("customers"))
    val rowTot = trans.groupBy(col("segment_from"))
      .agg(sum(col("customers")).as("__rt"))
    trans.join(rowTot, "segment_from")
      .select(col("segment_from"), col("segment_to"), col("customers"),
        round(col("customers").cast("double") / col("__rt").cast("double"),
          6).as("row_share"))
      .orderBy(col("segment_from"), col("segment_to"))
  }
}
