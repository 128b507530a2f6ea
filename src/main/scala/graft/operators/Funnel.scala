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

  /** Funnel stage TIMING — the question [[conversion]]'s counts leave
    * open: users convert, but how long does each hop take? Median and
    * quartiles of the whole-second delay between consecutive first-
    * completion times (the same strictly-ordered t_i chain conversion
    * uses), per stage pair — the dashboard row that finds the slow hop.
    *
    * Exactness: the t_i chain is conversion's (window minima,
    * deterministic); delays are exact integer seconds (epoch floors
    * subtracted); quartiles are type-1 order statistics off a
    * (pair, delay) census via the exact 4·cum ≥ q·n rule (the q326
    * idiom) — no interpolation, hash-replayable.
    *
    * Scale shape: one user-partitioned window pass (conversion's own
    * shuffle) + one map-side-combined delay census; quartile selection
    * runs on census rows; output is (steps−1) rows re-emitted through
    * the [[Grids]] guard. */
  def stageTiming(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.size <= 16,
      s"stageTiming: ${steps.size} steps outside [2,16]")
    require(steps.distinct.size == steps.size,
      "stageTiming: duplicate steps")
    val w = Window.partitionBy(col(userCol))
    val base = events
      .filter(col(tsCol).isNotNull && col(typeCol).isin(steps: _*))
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
    val pairRows = (1 until steps.size).map { i =>
      struct(lit(i.toLong).as("idx"),
        (unix_timestamp(col(s"__t$i")) -
          unix_timestamp(col(s"__t${i - 1}"))).as("delta"))
    }
    val spark = events.sparkSession
    Pinned.withCheckpoint(perUser
      .select(explode(array(pairRows: _*)).as("__p"))
      .select(col("__p.idx").as("__i"), col("__p.delta").as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy(col("__i"), col("__d")).agg(count(lit(1)).as("__c"))
    ) { census =>
      val wc = Window.partitionBy(col("__i")).orderBy(col("__d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = census.withColumn("__cum", sum(col("__c")).over(wc))
      val n = census.groupBy(col("__i")).agg(sum(col("__c")).as("n_users"))
      val withN = cum.join(n, "__i")
      val q = withN.groupBy(col("__i"), col("n_users"))
        .agg(
          min(when(col("__cum") * 4 >= col("n_users"), col("__d")))
            .as("p25_s"),
          min(when(col("__cum") * 2 >= col("n_users"), col("__d")))
            .as("median_s"),
          min(when(col("__cum") * 4 >= col("n_users") * 3, col("__d")))
            .as("p75_s"))
      val cells = Grids.collectBounded(q.orderBy(col("__i")),
        "stageTiming pair grid", maxRows = 16).collect()
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.types.{StructType, StructField,
        StringType, LongType}
      val rows = cells.map { r =>
        val i = r.getLong(0).toInt
        org.apache.spark.sql.Row(i.toLong, steps(i - 1), steps(i),
          r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }
      spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
        StructField("step_idx", LongType),
        StructField("stage_from", StringType),
        StructField("stage_to", StringType),
        StructField("n_users", LongType),
        StructField("p25_s", LongType),
        StructField("median_s", LongType),
        StructField("p75_s", LongType)))).orderBy(col("step_idx"))
    }
  }
}
