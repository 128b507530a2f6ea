package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion over an event stream — the product
  * analytics primitive q268's sequence support deliberately is not:
  * support counts ADJACENT pairs anywhere; a funnel asks "of the users
  * who did step 1, how many later did step 2, and later still step 3"
  * with strict temporal ordering and each step anchored to the FIRST
  * completion of the previous one (the standard "first-touch" funnel —
  * Kleppmann, DDIA ch.10's canonical sessionized-funnel example).
  *
  * Semantics: t₁ = min ts of step-1 events; tᵢ = min ts of step-i
  * events strictly after tᵢ₋₁. A user converts step i iff tᵢ exists.
  *
  * Exactness: timestamps compare exactly; user counts are BIGINTs; the
  * conversion ratios are single closing divisions, 6-dp.
  *
  * Scale shape: ONE Exchange(user) feeds a chain of same-partitioning
  * window minima (Catalyst fuses them into one Window stage — no
  * second shuffle), then a users-bounded aggregate closes onto the
  * ≤steps grid. Per-user state is |steps| timestamps, never the event
  * list. Steps are capped loudly: the window chain grows one
  * expression per step, not one shuffle per step. */
object Funnel {

  /** (step_idx, step, users, rate_prev, rate_first) one row per step. */
  def conversion(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 16,
      s"funnel: ${steps.size} steps outside [1,16]")
    require(steps.distinct.size == steps.size, "funnel: duplicate steps")
    val w = Window.partitionBy(col(userCol))
    val base = events
      .filter(col(tsCol).isNotNull && col(typeCol).isin(steps: _*))
    // t_i as chained window minima on one user partitioning
    val withTs = steps.zipWithIndex.foldLeft(base) { case (df, (st, i)) =>
      val cond: Column =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(s"__t${i - 1}").isNotNull &&
          col(tsCol) > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    val tAggs = steps.indices.map(i => min(col(s"__t$i")).as(s"__t$i"))
    val perUser = withTs.groupBy(col(userCol))
      .agg(tAggs.head, tAggs.tail: _*)
    val userCounts = steps.indices.map(i =>
      sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).as(s"__u$i"))
    val counts = perUser.agg(userCounts.head, userCounts.tail: _*)
    val stepRows = steps.zipWithIndex.map { case (st, i) =>
      val prev =
        if (i == 0) lit(1.0)
        else when(col(s"__u${i - 1}") > 0,
          col(s"__u$i").cast("double") / col(s"__u${i - 1}").cast("double"))
      struct(lit(i + 1).as("step_idx"), lit(st).as("step"),
        col(s"__u$i").as("users"),
        round(prev, 6).as("rate_prev"),
        round(when(col("__u0") > 0,
          col(s"__u$i").cast("double") / col("__u0").cast("double")), 6)
          .as("rate_first"))
    }
    counts.select(explode(array(stepRows: _*)).as("__s"))
      .select(col("__s.step_idx").as("step_idx"), col("__s.step").as("step"),
        col("__s.users").as("users"), col("__s.rate_prev").as("rate_prev"),
        col("__s.rate_first").as("rate_first"))
      .orderBy(col("step_idx"))
  }
}
