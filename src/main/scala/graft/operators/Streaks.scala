package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Longest consecutive-day activity streak per user, published as a
  * histogram — the HABIT read the suite's other engagement operators
  * miss: retention (q283) asks "came back in period k", sessions (q24)
  * ask "how long at a sitting", decay (q207) weights recency; a streak
  * asks "how many days IN A ROW", the metric behind habit-formation
  * analyses and streak-based product mechanics. The gaps-and-islands
  * form: on a user's distinct active days sorted ascending,
  * day − row_number() is constant exactly on maximal runs of
  * consecutive days, so islands fall out of one per-user window — no
  * self-joins, no recursion.
  *
  * Exactness: epoch-day arithmetic, island keys, streak lengths and
  * histogram counts are ALL exact integers — nothing floating anywhere.
  *
  * Scale shape: one distinct onto the (user, day) grid, one user-keyed
  * window (days sort per user, corpus never globally sorts), two
  * map-side-combined aggregates; the histogram is streak-length-
  * bounded. Output: (streak_len, users), ordered. */
object Streaks {

  def longestDailyStreak(events: DataFrame, userCol: String,
                         tsCol: String): DataFrame = {
    val days = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("__d"))
      .distinct()
    val w = Window.partitionBy(col("__u")).orderBy(col("__d"))
    days
      .withColumn("__k", col("__d") - row_number().over(w))
      .groupBy(col("__u"), col("__k"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col("__u"))
      .agg(max(col("__len")).as("__best"))
      .groupBy(col("__best").as("streak_len"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("streak_len"))
  }
}
