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

  /** Pettitt changepoint test (Pettitt 1979) — WHERE the series broke,
    * which [[cusum]] (needs a calibration prefix + σ units) and q252
    * Mann–Kendall (monotone trend, no location) don't answer: the
    * rank-based single-changepoint locator, robust to the heavy tails
    * that break mean-split scans. Statistic:
    *
    *   U_t = Σ_{i ≤ t} Σ_{j > t} sgn(x_i − x_j),  K = max_t |U_t|
    *
    * computed in O(grid) via the recurrence U_t = U_{t−1} + V_t with
    * V_t = Σ_j sgn(x_t − x_j) — and V_t is EXACTLY the midrank
    * identity V_t = 2·r̄_t − (T+1) = m2_t − 1 − T off the q319 rank
    * machinery (m2 = doubled midrank, an exact BIGINT), so the whole
    * trajectory is exact integers. The approximate significance
    * p ≈ min(1, 2·exp(−6K²/(T³+T²))) closes in doubles from those
    * integers (both engines exp the SAME IEEE quotient; 6-dp round —
    * the q321 exp/ln precedent).
    *
    * Output: the full |grid| trajectory (t, u, is_peak) with the
    * verdict (k, t_star, p_approx) repeated per row — the reviewer
    * reads the shape, not just the argmax; t_star is the FIRST peak
    * (min t at |U| = K, deterministic under ties). Integer-scaled
    * values only (the mannWhitney contract).
    *
    * Scale shape: the input must already BE a grid (the Seasonal
    * idiom), loudly bounded at 2¹² positions; one pinned pass derives
    * it, the census/rank/cumsum windows all run on grid rows. */
  def pettitt(df: DataFrame, tCol: String, vCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt0 = df.schema(vCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt0),
      s"pettitt: valueCol '$vCol' is $vt0 — integer-scaled only")
    Pinned.withCheckpoint(df
      .select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    ) { g =>
      val spark = g.sparkSession
      val tn = g.count()
      require(tn >= 3 && tn <= (1 << 12),
        s"pettitt: $tn grid positions outside [3, 4096] — pre-aggregate " +
          "onto a bounded time grid first (the Seasonal idiom)")
      val wv = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = g.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__m2",
          lit(2L) * (sum(col("__c")).over(wv) - col("__c")) +
            col("__c") + 1L)
        .select(col("__v"), col("__m2"))
      val wt = Window.orderBy(col("__t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ut = g.join(ranked, "__v")
        .withColumn("__u", sum(col("__m2") - 1L - tn).over(wt))
      val peak = ut.agg(max(abs(col("__u")))).head().getLong(0)
      val tStar = ut.filter(abs(col("__u")) === peak)
        .agg(min(col("__t"))).head().getLong(0)
      val p = math.min(1.0, 2.0 * math.exp(
        -6.0 * peak.toDouble * peak.toDouble /
          (tn.toDouble * tn.toDouble * tn.toDouble +
            tn.toDouble * tn.toDouble)))
      val out = ut
        .select(col("__t").as("t"), col("__u").as("u"),
          (col("__t") === tStar).as("is_peak"), lit(peak).as("k"),
          lit(tStar).as("t_star"), lit(tn).as("n"),
          round(lit(p), 6).as("p_approx"))
        .orderBy(col("t"))
      Grids.collectBounded(out, "pettitt time grid")
    }
  }
}
