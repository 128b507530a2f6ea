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
}
