package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition of an event series —
  * value = trend + seasonal + remainder (the moving-average STL
  * ancestor): `trend` is the centered (2·half+1)-point moving average,
  * `seasonal` is the per-period-position mean of the DETRENDED series
  * (computing it on the raw series would re-count the level the trend
  * already carries — the classic decomposition pitfall), `remainder`
  * is what neither explains. The monitoring uses: a feed whose
  * REMAINDER variance jumps changed behavior (not just volume); a
  * capacity planner reads `trend`; an anomaly detector thresholds
  * `remainder` where raw values would false-alarm every midnight
  * (q152's rolling z-score without the seasonal term baked in).
  *
  * Exactness: hourly totals accumulate as exact DECIMAL(38,2) (the
  * q207 discipline); the trend is the exact window DECIMAL sum with
  * ONE closing double division; the seasonal mean avoids summing
  * doubles (order-dependent) by the scale trick
  * mean(v − tn/w) = Σ(w·v − tn) / (w·n) — the numerator is an exact
  * DECIMAL on any partitioning, one division closes. remainder is a
  * fixed double expression tree. Trend (and so remainder) is NULL at
  * the series edges (incomplete window) rather than a shortened
  * average; a period position with no interior row gets NULL seasonal
  * — honest, never silently shortened.
  *
  * Scale shape: one map-side-combined (hour-bucket) aggregate over the
  * corpus; every window after that runs on the bounded TIME GRID
  * (hours of observed span — the QuantileNorm grid-window contract:
  * the series length is calendar-bounded, not corpus-bounded). */
object Seasonal {

  /** (hour, v, trend, seasonal, remainder) per observed hourly bucket —
    * `periodHours`-periodic seasonality, (2·halfWindow+1)-point
    * centered trend. */
  def decompose(df: DataFrame, tsCol: String, valueCol: String,
                periodHours: Int = 24, halfWindow: Int = 12): DataFrame = {
    require(periodHours >= 2, s"bad periodHours=$periodHours")
    require(halfWindow >= 1, s"bad halfWindow=$halfWindow")
    val w = 2 * halfWindow + 1
    val hourly = df
      .filter(col(tsCol).isNotNull)
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("__v"))
    // period position from EPOCH hours, not hour-of-day: hour() is
    // 0..23, so any period that does not divide 24 would silently
    // misalign (weekly 168 collapses to daily; 7 breaks at every day
    // boundary). The session runs UTC, so for period 24 this is the
    // same position labeling as before.
    val pos = pmod(floor(unix_timestamp(col("hour")) / 3600).cast("long"),
      lit(periodHours.toLong))
    val wTrend = Window.orderBy(col("hour")).rowsBetween(-halfWindow, halfWindow)
    val wSeason = Window.partitionBy(pos)
    val trended = hourly
      .withColumn("__tn", sum(col("__v")).over(wTrend))
      .withColumn("__tc", count(lit(1)).over(wTrend))
      // exact detrended numerator, w-scaled: w·v − Σwindow (NULL at edges)
      .withColumn("__dn", when(col("__tc") === w,
        (col("__v") * w - col("__tn")).cast("decimal(38,2)")))
    val trend = when(col("__tc") === w, col("__tn").cast("double") / w)
    val seasonal = (sum(col("__dn")).over(wSeason).cast("double") /
      (count(col("__dn")).over(wSeason) * w).cast("double"))
    trended.select(col("hour"),
        col("__v").cast("double").as("v"),
        trend.as("trend"),
        seasonal.as("seasonal"),
        (col("__v").cast("double") - trend - seasonal).as("remainder"))
      .orderBy(col("hour"))
  }

  /** Trend/seasonality STRENGTH of the decomposition — the scalars a
    * monitor trends where [[decompose]] gives a curve (Wang, Smith &
    * Hyndman 2006; FPP3 §4.3):
    *
    *   F_trend    = max(0, 1 − Var(R)/Var(T + R))
    *   F_seasonal = max(0, 1 − Var(R)/Var(S + R))
    *
    * Near 1 = the component dominates; near 0 = it is noise. A feed
    * whose F_seasonal collapses between corpus versions lost its daily
    * rhythm (bot flood); one whose F_trend jumps is drifting. Rows at
    * the trend window's edges (NULL trend) are excluded — the same
    * rows every engine excludes.
    *
    * Determinism: the variances fold Σx and Σx² in HOUR ORDER over the
    * calendar-bounded grid (the q279 double-fold discipline); the
    * closes are fixed double trees, 6-dp. One row: (n_hours,
    * var_remainder, f_trend, f_seasonal). */
  def strength(df: DataFrame, tsCol: String, valueCol: String,
               periodHours: Int = 24, halfWindow: Int = 12): DataFrame = {
    val dec = decompose(df, tsCol, valueCol, periodHours, halfWindow)
      .filter(col("trend").isNotNull)
    def foldSorted(v: org.apache.spark.sql.Column) = aggregate(
      transform(array_sort(collect_list(struct(col("hour"), v.as("v")))),
        p => p.getField("v")),
      lit(0.0), (acc, x) => acc + x)
    val sums = dec.agg(count(lit(1)).as("__n"),
      foldSorted(col("remainder")).as("__sr"),
      foldSorted(col("remainder") * col("remainder")).as("__srr"),
      foldSorted(col("trend") + col("remainder")).as("__st"),
      foldSorted((col("trend") + col("remainder")) *
        (col("trend") + col("remainder"))).as("__stt"),
      foldSorted(col("seasonal") + col("remainder")).as("__ss"),
      foldSorted((col("seasonal") + col("remainder")) *
        (col("seasonal") + col("remainder"))).as("__sss"))
    val n = col("__n").cast("double")
    def vr(s: org.apache.spark.sql.Column, ss: org.apache.spark.sql.Column) =
      ss / n - (s / n) * (s / n)
    val varR = vr(col("__sr"), col("__srr"))
    val varTR = vr(col("__st"), col("__stt"))
    val varSR = vr(col("__ss"), col("__sss"))
    val out = sums.select(col("__n").as("n_hours"),
      round(varR, 6).as("var_remainder"),
      round(greatest(lit(0.0),
        when(varTR > 0, lit(1.0) - varR / varTR).otherwise(lit(0.0))), 6)
        .as("f_trend"),
      round(greatest(lit(0.0),
        when(varSR > 0, lit(1.0) - varR / varSR).otherwise(lit(0.0))), 6)
        .as("f_seasonal"))
    require(!out.head().isNullAt(0), "strength: empty interior grid")
    out
  }
}
