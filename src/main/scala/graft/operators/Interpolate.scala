package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid resampling with linear interpolation — the third member of the
  * time-series family ([[graft.queries.AdvancedQueries]] q78 densifies
  * a grid, q80 forward-fills; this one estimates BETWEEN observations):
  * sensor/metric feature pipelines want values on a regular grid, and
  * step-function LOCF biases anything that trends.
  *
  * Single-shuffle plan (the [[AsOfJoin]] union-sort shape): tag
  * observations 0 and grid points 1, union, ONE
  * `partitionBy(key).orderBy(ts, tag)` exchange serves both the
  * backward (last obs ≤ t) and forward (first obs ≥ t) window scans;
  * grid rows then compute v0 + (v1−v0)·(t−t0)/(t1−t0) in one
  * projection. The grid is bounded inside [ceil(min obs), max obs] per
  * key, so both neighbors always exist; a grid point landing exactly
  * on an observation returns that observation (no 0/0).
  *
  * Cross-engine exactness: the interpolation is a single fixed-shape
  * double expression over integer microsecond deltas — IEEE ops are
  * deterministic, so DuckDB replaying the same expression gets the
  * same bits (rounded to 6 in the gate for display).
  */
object Interpolate {

  /** @param step grid step, e.g. "1 hour" (also the `date_trunc` unit
    *   when `truncUnit` is its first word). */
  def linearGrid(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                 step: String = "1 hour", truncUnit: String = "hour"): DataFrame = {
    val obs = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(valCol).cast("double").as("v"), lit(0).as("tag"))
    val bounds = obs.groupBy(col("k"))
      .agg(min(col("ts")).as("tmin"), max(col("ts")).as("tmax"))
      .withColumn("g0raw", date_trunc(truncUnit, col("tmin")))
      // ceil to the grid so every grid point has a left neighbor
      .withColumn("g0", when(col("g0raw") < col("tmin"),
        col("g0raw") + expr(s"INTERVAL $step")).otherwise(col("g0raw")))
      .withColumn("g1", date_trunc(truncUnit, col("tmax")))
      .filter(col("g0") <= col("g1"))
    val spine = bounds.select(col("k"),
      explode(sequence(col("g0"), col("g1"), expr(s"INTERVAL $step"))).as("ts"))
      .withColumn("v", lit(null).cast("double"))
      .withColumn("tag", lit(1))
    val w = Window.partitionBy(col("k")).orderBy(col("ts"), col("tag"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs: Column = when(col("tag") === 0, unix_micros(col("ts")))
    val obsV: Column = when(col("tag") === 0, col("v"))
    obs.unionByName(spine)
      .withColumn("t0", last(obsTs, ignoreNulls = true).over(back))
      .withColumn("v0", last(obsV, ignoreNulls = true).over(back))
      .withColumn("t1", first(obsTs, ignoreNulls = true).over(fwd))
      .withColumn("v1", first(obsV, ignoreNulls = true).over(fwd))
      .filter(col("tag") === 1)
      .withColumn("vi",
        when(col("t0") === unix_micros(col("ts")), col("v0"))
          .otherwise(col("v0") + (col("v1") - col("v0")) *
            ((unix_micros(col("ts")) - col("t0")).cast("double") /
              (col("t1") - col("t0")).cast("double"))))
      .select(col("k").as(keyCol), col("ts"), col("vi"))
  }
}
