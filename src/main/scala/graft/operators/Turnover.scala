package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Day-over-day active-set turnover — the POPULATION-FLOW read the
  * cohort matrix (q283) aggregates away: retention buckets users by
  * first-seen and asks "still here at age k"; turnover compares each
  * day's active SET against the previous day's and decomposes the
  * change into retained / new / churned, with the Jaccard overlap as
  * the one-number day-to-day stability scalar (a composition break —
  * bot influx, logging gap — shows as a Jaccard cliff on an otherwise
  * flat DAU curve).
  *
  * Exactness: set sizes, intersections and the flow decomposition are
  * exact BIGINTs off the distinct (user, day) grid; Jaccard is the one
  * closing division. Only consecutive days emit (a day with no
  * predecessor has no flow to decompose).
  *
  * Scale shape: one distinct onto the (user, day) grid, one user-keyed
  * self-join restricted to day = day+1 (co-partitioned on user — no
  * second shuffle), two map-side-combined day censuses; output is
  * calendar-bounded. */
object Turnover {

  /** (day, prev_active, active, retained, new_users, churned, jaccard),
    * ordered by day; `day` is epoch days. */
  def dayOverDay(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame = {
    val days = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("__d"))
      .distinct()
    Pinned.withCheckpoint(days) { dd =>
      val sizes = dd.groupBy(col("__d")).agg(count(lit(1)).as("active"))
      val retained = dd.as("a")
        .join(dd.as("b"),
          col("a.__u") === col("b.__u") &&
            col("a.__d") === col("b.__d") - 1)
        .groupBy(col("b.__d").as("__d"))
        .agg(count(lit(1)).as("retained"))
      val out = sizes.select(col("__d"), col("active"))
        .join(sizes.select((col("__d") + 1).as("__d"),
          col("active").as("prev_active")), "__d")
        .join(retained, Seq("__d"), "left")
        .withColumn("retained", coalesce(col("retained"), lit(0L)))
        .select(col("__d").as("day"), col("prev_active"), col("active"),
          col("retained"),
          (col("active") - col("retained")).as("new_users"),
          (col("prev_active") - col("retained")).as("churned"),
          round(col("retained").cast("double") /
            (col("prev_active") + col("active") - col("retained"))
              .cast("double"), 6).as("jaccard"))
        .orderBy(col("day"))
      // calendar-bounded rows; re-emit driver-side so no lazy plan
      // outlives the checkpoint (the Grids discipline)
      Grids.collectBounded(out, "dayOverDay day grid")
    }
  }

  /** Weekly growth accounting — the FULL population ledger
    * [[dayOverDay]]'s two-day window cannot give: every active user in
    * week w is exactly one of NEW (first week ever), RETAINED (active
    * in w−1) or RESURRECTED (seen before, but not in w−1), and every
    * user lost is CHURNED (active w−1, silent in w). The identity
    * active = new + retained + resurrected is structural, and the
    * quick ratio (new + resurrected)/churned is the one-number "is
    * growth winning" scalar of the standard growth-accounting
    * framework. A flat DAU with a sinking quick ratio is a leaky
    * bucket being refilled — invisible to every aggregate count.
    *
    * Exactness: week indices (epoch-day // 7), first-seen weeks and
    * all four flows are exact integers off the distinct (user, week)
    * grid; the quick ratio is one closing division (NULL when churn is
    * zero). Weeks with no activity emit no row (documented).
    *
    * Scale shape: one distinct onto the (user, week) grid, one
    * user-keyed min (same Exchange), one user-keyed self-join on
    * w−1 presence (co-partitioned); output is calendar-bounded. */
  def weeklyGrowthAccounting(events: DataFrame, userCol: String,
                             tsCol: String): DataFrame = {
    val weeks = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        (datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long") / 7L).cast("long").as("__w"))
      .distinct()
    Pinned.withCheckpoint(weeks) { ww =>
      val first = ww.groupBy(col("__u")).agg(min(col("__w")).as("__f"))
      val prev = ww.select(col("__u"), (col("__w") + 1).as("__w"),
        lit(true).as("__inprev"))
      val flags = ww.join(first, "__u")
        .join(prev, Seq("__u", "__w"), "left")
        .withColumn("__new", col("__w") === col("__f"))
        .withColumn("__ret", coalesce(col("__inprev"), lit(false)))
      val flows = flags.groupBy(col("__w"))
        .agg(count(lit(1)).as("active"),
          sum(when(col("__new"), 1L).otherwise(0L)).as("new_users"),
          sum(when(!col("__new") && col("__ret"), 1L).otherwise(0L))
            .as("retained"),
          sum(when(!col("__new") && !col("__ret"), 1L).otherwise(0L))
            .as("resurrected"))
      val sizes = ww.groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      val out = flows
        .join(sizes.select((col("__w") + 1).as("__w"),
          col("__n").as("__prevn")), Seq("__w"), "left")
        // churned = |prev| − |prev ∩ cur|; retained IS that intersection
        // (a first-week user cannot have been active in w−1)
        .withColumn("churned",
          coalesce(col("__prevn"), lit(0L)) - col("retained"))
        .select(col("__w").as("week"), col("active"), col("new_users"),
          col("retained"), col("resurrected"), col("churned"),
          when(col("churned") > 0,
            round((col("new_users") + col("resurrected")).cast("double") /
              col("churned").cast("double"), 6))
            .otherwise(lit(null).cast("double")).as("quick_ratio"))
        .orderBy(col("week"))
      Grids.collectBounded(out, "weeklyGrowthAccounting week grid")
    }
  }
}
