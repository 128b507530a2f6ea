package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection over a time-grid series (Page 1954) —
  * the sequential complement to the per-point monitors: q152's rolling
  * z-score flags single outlier hours, q200/q208's KS flags a shifted
  * WINDOW; CUSUM accumulates SMALL persistent shifts until they are
  * undeniable — the classic "the feed drifted 0.3σ six weeks ago and
  * nothing alarmed" failure. Reference statistics come from a leading
  * calibration prefix (the q208 reference-sample discipline: the
  * monitor never learns from what it monitors).
  *
  * The textbook recursion s_t = max(0, s_{t−1} + x_t − μ − k) is a
  * scan, not a window — but it has the closed form
  *
  *   s_t = C_t − min_{0 ≤ j ≤ t} C_j,   C_t = Σ_{i ≤ t} (x_i − μ − k),
  *   C_0 = 0
  *
  * (subtracting the running minimum — floored at the empty prefix's
  * C_0 = 0 — IS the max(0, ·) reset), which
  * makes CUSUM two cumulative windows over the grid. Proof obligation
  * pinned in ChangePointSpec against the sequential recursion.
  *
  * Exactness: μ = Σv/n_ref is kept RATIONAL by n_ref-scaling the
  * deviations (d_t = n_ref·v_t − Σv_ref − n_ref·k — exact decimals on
  * any partitioning); the slack k and threshold h are the reference
  * σ (computed from exact sums, one IEEE sqrt) rounded to 6 dp and
  * re-entered as EXACT decimal constants, so the alarm decision
  * s_t > n_ref·h compares exact decimals — a boundary alarm cannot
  * flip across engines or partitionings.
  *
  * Scale shape: one map-side-combined grid aggregate over the corpus;
  * the reference stats are one bounded row; the two cumulative windows
  * run on the calendar-bounded grid (the Seasonal idiom). */
object ChangePoint {

  /** Per monitored grid row: (t, v, cusum, alarm) — `cusum` the
    * one-sided upper statistic in value units, `alarm` when it
    * crosses hSigma·σ_ref. Grid rows in the first `refLen` TIME
    * positions calibrate (μ, σ) and are excluded from monitoring
    * (sparse grids allowed — refLen is a window, not a row count). */
  def cusum(df: DataFrame, tCol: String, vCol: String, refLen: Int,
            kSigma: Double = 0.5, hSigma: Double = 5.0): DataFrame = {
    require(refLen >= 2, s"bad refLen=$refLen")
    val g = df.select(col(tCol).cast("long").as("t"),
        col(vCol).cast("decimal(38,6)").as("v"))
      .filter(col("t").isNotNull && col("v").isNotNull)
      .localCheckpoint() // grid-bounded; read 3× below
    val t0 = g.agg(min(col("t"))).head().getLong(0)
    val ref = g.filter(col("t") < t0 + refLen)
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("decimal(38,6)").as("sv"),
        sum(col("v") * col("v")).cast("decimal(38,12)").as("svv")).head()
    // refLen is a TIME window (grid positions), not a row count — the
    // grid may be sparse (hours with no events); calibration needs
    // enough observed rows in the window to estimate (μ, σ)
    val nRef = ref.getLong(0)
    require(nRef >= math.max(2, refLen / 4),
      s"calibration window [$t0, ${t0 + refLen}) has only $nRef observed " +
        s"grid rows (need >= ${math.max(2, refLen / 4)}) — widen refLen " +
        "or densify the grid first")
    val sv = ref.getDecimal(1); val svv = ref.getDecimal(2)
    // σ_ref from exact sums: sqrt(n·Σv² − (Σv)²)/n — one IEEE sqrt
    val sd = math.sqrt(
      (BigDecimal(svv) * nRef - BigDecimal(sv) * BigDecimal(sv)).toDouble) / nRef
    def pin(x: Double): java.math.BigDecimal = // 6-dp exact re-entry
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val k = pin(sd * kSigma); val h = pin(sd * hSigma)
    // CONTRACT: unpartitioned running window — sound ONLY because the
    // input is the calendar-bounded grid (one row per time position),
    // never corpus rows; a corpus-scale caller must pre-aggregate to
    // the grid first (the Seasonal idiom)
    val wc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val monitored = g.filter(col("t") >= t0 + refLen)
      // n_ref-scaled exact deviation: n·v − Σv_ref − n·k
      .withColumn("__d",
        (col("v") * nRef - lit(sv) - lit(k).cast("decimal(38,6)") * nRef)
          .cast("decimal(38,6)"))
      .withColumn("__c", sum(col("__d")).over(wc).cast("decimal(38,6)"))
      // the empty prefix C_0 = 0 floors the running min (see doc)
      .withColumn("__s", (col("__c") -
          least(min(col("__c")).over(wc), lit(0).cast("decimal(38,6)")))
        .cast("decimal(38,6)"))
    monitored.select(col("t"), col("v").cast("double").as("v"),
        (col("__s").cast("double") / nRef).as("cusum"),
        (col("__s") > lit(h).cast("decimal(38,6)") * nRef).as("alarm"))
      .orderBy(col("t"))
  }
}
