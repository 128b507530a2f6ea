package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-feature ordinary least squares by normal equations — the
  * multivariate step past q173's single-feature trend fit: the same
  * one-pass sufficient-statistic shape (the reason OLS — not gradient
  * descent — is the corpus-scale workhorse: a 100 TB fit is ONE
  * map-side-combined aggregate producing ten numbers, no iteration,
  * no learning rate), solved in closed form by Cramer's rule on the
  * centered 2×2 system. Two features because that is where
  * collinearity diagnostics begin: the output carries the VIF
  * (= 1/(1−r₁₂²)) — the "these two features are the same signal"
  * audit a wide training table needs before anyone trusts the
  * coefficients.
  *
  * Exactness: all ten sufficient statistics accumulate as exact
  * DECIMAL sums of DECIMAL(18,6)-cast inputs (partitioning-invariant);
  * the centered moments C_ij = n·S_ij − S_i·S_j stay exact decimals,
  * and β, R², VIF close in one fixed double tree. A singular system
  * (perfectly collinear features) fails LOUDLY — NULL-ing the
  * coefficients would let a degenerate fit flow into downstream
  * arithmetic looking like a result. */
object Regression {

  private def dec(c: String) = col(c).cast("decimal(18,6)")
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c).cast("decimal(38,12)")

  /** One row: (n, b0, b1, b2, r2, r12, vif) for
    * yCol ≈ b0 + b1·x1Col + b2·x2Col (`r12` is |corr(x1, x2)|). NULL
    * rows are excluded. ONE corpus pass: the closing tree runs on the
    * collected exact sums (ten numbers), in a fixed order. */
  def ols2(df: DataFrame, yCol: String, x1Col: String,
           x2Col: String): DataFrame = {
    val u = df.filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .select(dec(yCol).as("__y"), dec(x1Col).as("__x1"), dec(x2Col).as("__x2"))
    val r = u.agg(count(lit(1)).as("n"),
      dsum(col("__x1")).as("s1"), dsum(col("__x2")).as("s2"),
      dsum(col("__y")).as("sy"),
      dsum(col("__x1") * col("__x1")).as("s11"),
      dsum(col("__x2") * col("__x2")).as("s22"),
      dsum(col("__x1") * col("__x2")).as("s12"),
      dsum(col("__x1") * col("__y")).as("s1y"),
      dsum(col("__x2") * col("__y")).as("s2y"),
      dsum(col("__y") * col("__y")).as("syy")).head()
    val n = r.getLong(0)
    require(n >= 3, s"ols2 needs >= 3 rows, got $n")
    val Seq(s1, s2, sy, s11, s22, s12, s1y, s2y, syy) =
      (1 to 9).map(i => BigDecimal(r.getDecimal(i)))
    // centered moments in the DOUBLE domain — ij·n − i·j with each
    // exact decimal cast to double FIRST, then IEEE mult/sub: the
    // replay contract (an unbounded-precision exact product here would
    // be unmatchable in engines whose decimals cap at 38 digits)
    def c(ij: BigDecimal, i: BigDecimal, j: BigDecimal): Double =
      ij.toDouble * n - i.toDouble * j.toDouble
    val c11 = c(s11, s1, s1); val c22 = c(s22, s2, s2)
    val c12 = c(s12, s1, s2)
    val c1y = c(s1y, s1, sy); val c2y = c(s2y, s2, sy)
    val cyy = c(syy, sy, sy)
    val det = c11 * c22 - c12 * c12
    require(det != 0.0,
      "ols2: singular normal equations — x1 and x2 are perfectly " +
        "collinear (or constant); drop one feature")
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val b0 = (sy.toDouble - b1 * s1.toDouble - b2 * s2.toDouble) / n
    val r12sq = c12 * c12 / (c11 * c22)
    val spark = df.sparkSession
    spark.range(1).select(lit(n).as("n"), lit(b0).as("b0"),
      lit(b1).as("b1"), lit(b2).as("b2"),
      lit((b1 * c1y + b2 * c2y) / cyy).as("r2"),
      lit(math.sqrt(r12sq)).as("r12"),
      lit(1.0 / (1.0 - r12sq)).as("vif"))
  }

  /** Simple OLS y ≈ a + b·x over DOUBLE-valued columns (log-transformed
    * metrics, ratios) — the [[ols2]] shape without the integer-input
    * contract: per-row doubles are deterministic given the stored
    * values, so the five sufficient statistics accumulate as
    * DECIMAL(38,12) casts of the per-row terms (order-independent, the
    * chiSquare idiom) and the close is one fixed double tree. One row:
    * (n, slope, intercept, r2). One map-side-combined corpus pass. */
  def ols1(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d12 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,12)")
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    val r = u.agg(count(lit(1)).as("n"),
      sum(d12(col("__x"))).as("sx"), sum(d12(col("__y"))).as("sy"),
      sum(d12(col("__x") * col("__x"))).as("sxx"),
      sum(d12(col("__x") * col("__y"))).as("sxy"),
      sum(d12(col("__y") * col("__y"))).as("syy")).head()
    val n = r.getLong(0)
    require(n >= 3, s"ols1 needs >= 3 rows, got $n")
    val Seq(sx, sy, sxx, sxy, syy) =
      (1 to 5).map(i => BigDecimal(r.getDecimal(i)).toDouble)
    val cxx = sxx * n - sx * sx
    val cxy = sxy * n - sx * sy
    val cyy = syy * n - sy * sy
    require(cxx > 0.0, "ols1: x is constant")
    require(cyy > 0.0, "ols1: y is constant")
    val b = cxy / cxx
    val a = (sy - b * sx) / n
    val spark = df.sparkSession
    spark.range(1).select(lit(n).as("n"),
      round(lit(b), 6).as("slope"),
      round(lit(a), 6).as("intercept"),
      round(lit(cxy * cxy / (cxx * cyy)), 6).as("r2"))
  }

  /** Consecutive-step lag pairs off a bounded integer time grid — the
    * shared front door of [[grangerLag1]] and [[dickeyFuller]]: rows
    * (t, cols...) keep only steps where t−1 also exists (gaps drop —
    * a lag across a hole is not a lag; documented contract), and the
    * grid is loudly bounded (the Seasonal idiom). */
  private def lagPairs(df: DataFrame, tCol: String,
                       cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select((col(tCol).cast("long").as("__t") +:
      cols.map(c => col(c).cast("long").as(s"__$c"))): _*)
      .filter(cols.map(c => col(s"__$c").isNotNull)
        .foldLeft(col("__t").isNotNull)(_ && _))
    val n = base.count()
    require(n >= 5 && n <= (1 << 16),
      s"lagPairs: $n grid positions outside [5, 65536] — pre-aggregate " +
        "onto a bounded time grid first (the Seasonal idiom)")
    val w = Window.orderBy(col("__t")) // grid-bounded by the require
    var out = base
    cols.foreach { c =>
      out = out.withColumn(s"__${c}_lag", lag(col(s"__$c"), 1).over(w))
    }
    out.withColumn("__t_lag", lag(col("__t"), 1).over(w))
      .filter(col("__t") - col("__t_lag") === 1)
  }

  // cast BEFORE the multiply — a long×long product of two cent-scaled
  // hourly sums can wrap int64 silently at corpus scale
  private def dl(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
  private def dec0(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,0)")).cast("decimal(38,0)")

  /** Granger causality, one lag (Granger 1969): does x's PAST improve
    * the prediction of y beyond y's own past — the time-series
    * question plain correlation (q257/q258) cannot ask, because
    * contemporaneous correlation has no direction. Full model
    * y_t = a + b·y_{t−1} + c·x_{t−1} vs restricted y_t = a + b·y_{t−1};
    * F = (RSS_r − RSS_f) / (RSS_f/(n−3)) with 1 numerator df.
    * (Predictive, not causal-in-the-counterfactual-sense — the
    * standard caveat.)
    *
    * Exactness: both models close from the same nine exact
    * DECIMAL(38,0) sums over the consecutive-lag pairs via the [[ols2]]
    * centered-moment double tree (C_ij = S_ij·n − S_i·S_j, coefficients
    * by Cramer, RSS·n = C_yy − Σb·C_by) — one grid pass, SQL-replayable
    * bit for bit.
    *
    * Scale shape: the input must already BE a bounded time grid; the
    * lag window and the sums run on grid rows. One row: (n, b_ylag,
    * b_xlag, f_stat, r2_full, r2_restricted). */
  def grangerLag1(df: DataFrame, tCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val pairs = lagPairs(df, tCol, Seq(xCol, yCol))
    val y = col(s"__$yCol"); val yl = col(s"__${yCol}_lag")
    val xl = col(s"__${xCol}_lag")
    val r = pairs.agg(count(lit(1)).as("n"),
      dec0(y).as("sy"), dec0(yl).as("s1"), dec0(xl).as("sx"),
      dec0(dl(yl) * yl).as("s11"), dec0(dl(xl) * xl).as("sxx"),
      dec0(dl(yl) * xl).as("s1x"), dec0(dl(yl) * y).as("s1y"),
      dec0(dl(xl) * y).as("sxy"), dec0(dl(y) * y).as("syy")).head()
    val n = r.getLong(0)
    require(n >= 5, s"grangerLag1: $n consecutive pairs (need >= 5)")
    val Seq(sy, s1, sx, s11, sxx, s1x, s1y, sxy, syy) =
      (1 to 9).map(i => BigDecimal(r.getDecimal(i)))
    def c(ij: BigDecimal, i: BigDecimal, j: BigDecimal): Double =
      ij.toDouble * n - i.toDouble * j.toDouble
    val c11 = c(s11, s1, s1); val cxx = c(sxx, sx, sx)
    val c1x = c(s1x, s1, sx)
    val c1y = c(s1y, s1, sy); val cxy = c(sxy, sx, sy)
    val cyy = c(syy, sy, sy)
    require(cyy > 0.0, "grangerLag1: y is constant on the grid")
    require(c11 > 0.0, "grangerLag1: lagged y is constant on the grid")
    val det = c11 * cxx - c1x * c1x
    require(det != 0.0,
      "grangerLag1: singular normal equations — lagged x and lagged y " +
        "are perfectly collinear (or x is constant)")
    val b = (c1y * cxx - cxy * c1x) / det
    val cc = (cxy * c11 - c1y * c1x) / det
    val rssF = cyy - b * c1y - cc * cxy
    val rssR = cyy - c1y * c1y / c11
    require(rssF > 0.0,
      "grangerLag1: zero full-model residual — the fit is exact, F " +
        "undefined")
    val f = (rssR - rssF) / (rssF / (n - 3).toDouble)
    val spark = df.sparkSession
    spark.range(1).select(lit(n).as("n"),
      round(lit(b), 6).as("b_ylag"), round(lit(cc), 6).as("b_xlag"),
      round(lit(f), 6).as("f_stat"),
      round(lit(1.0 - rssF / cyy), 6).as("r2_full"),
      round(lit(1.0 - rssR / cyy), 6).as("r2_restricted"))
  }

  /** Dickey–Fuller unit-root regression (1979, no augmentation lags,
    * with intercept): Δy_t = a + γ·y_{t−1}; γ near 0 (t ≳ −2.9 at 5%)
    * means shocks PERSIST (random walk — every "trend" read off the
    * series is spurious-regression bait); γ < 0 with a deep-negative
    * t means the series mean-reverts and level analytics are sound.
    * The t statistic is reported raw — its null distribution is the DF
    * table, not Student's t; compare to the published critical values.
    *
    * Exactness: the five sums over consecutive-lag pairs are exact
    * DECIMAL(38,0); γ, RSS and the t close in one fixed double tree
    * (simple-regression centered moments), SQL-replayable.
    *
    * Scale shape: bounded-grid contract as [[grangerLag1]]. One row:
    * (n, gamma, rho, t_stat). */
  def dickeyFuller(df: DataFrame, tCol: String, yCol: String): DataFrame = {
    val pairs = lagPairs(df, tCol, Seq(yCol))
    val y = col(s"__$yCol"); val yl = col(s"__${yCol}_lag")
    val d = y - yl
    val r = pairs.agg(count(lit(1)).as("n"),
      dec0(yl).as("sx"), dec0(d).as("sd"),
      dec0(dl(yl) * yl).as("sxx"), dec0(dl(yl) * d).as("sxd"),
      dec0(dl(d) * d).as("sdd")).head()
    val n = r.getLong(0)
    require(n >= 5, s"dickeyFuller: $n consecutive pairs (need >= 5)")
    val Seq(sx, sd, sxx, sxd, sdd) =
      (1 to 5).map(i => BigDecimal(r.getDecimal(i)))
    def c(ij: BigDecimal, i: BigDecimal, j: BigDecimal): Double =
      ij.toDouble * n - i.toDouble * j.toDouble
    val cxx = c(sxx, sx, sx); val cxd = c(sxd, sx, sd)
    val cdd = c(sdd, sd, sd)
    require(cxx > 0.0, "dickeyFuller: lagged y is constant on the grid")
    val gamma = cxd / cxx
    val rssN = cdd - gamma * cxd
    require(rssN > 0.0,
      "dickeyFuller: zero residual — the walk is exactly deterministic")
    val t = gamma / math.sqrt(rssN / ((n - 2).toDouble * cxx))
    val spark = df.sparkSession
    spark.range(1).select(lit(n).as("n"),
      round(lit(gamma), 6).as("gamma"),
      round(lit(1.0 + gamma), 6).as("rho"),
      round(lit(t), 6).as("t_stat"))
  }
}
