package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Simple exponential smoothing on a time grid — the forecasting
  * baseline under the monitoring family (q235/q256 alert on
  * deviations; SES supplies the expectation they deviate FROM):
  * L₁ = y₁, Lₜ = α·yₜ + (1−α)·Lₜ₋₁, with the one-step-ahead error
  * eₜ = yₜ − Lₜ₋₁ (Hyndman & Athanasopoulos, FPP §8.1). The recursion
  * unrolls to the closed weighted form
  *
  *   Lₜ = Σ_{i=2..t} α·(1−α)^{t−i}·yᵢ + (1−α)^{t−1}·y₁
  *
  * which is how a SET engine computes it EXACTLY: a triangular
  * pair-grid join (i ≤ t) with analytic weights — no sequential scan
  * through the driver.
  *
  * Determinism contract: the geometric weights (1−α)^j are PINNED
  * 12-dp doubles computed once ([[weights]]) — replayed engines
  * multiply IDENTICAL doubles instead of racing their libm `pow`
  * implementations (1-ulp divergence would otherwise flip a 6-dp
  * boundary). Weights that pin to 0 (j ≳ 45 at α = 0.3) drop their
  * pairs entirely, so the effective pair space is grid × effective
  * horizon, and per-t terms fold in i-ORDER via the sorted-list fold
  * (the q279 discipline).
  *
  * Scale shape: the input must already BE a grid (one row per time
  * position — the Seasonal idiom: corpus events pre-aggregate onto
  * calendar hours first), loudly bounded at 2¹² positions; the
  * row_number window runs on the grid only. A corpus-scale caller
  * never feeds raw rows here. */
object Smoothing {

  /** (1−α)^j for j < n, each pinned to 12 dp (HALF_UP — the replay
    * rounding both engines share for positives). */
  def weights(alpha: Double, n: Int): Array[Double] =
    Array.tabulate(n)(j =>
      new java.math.BigDecimal(math.pow(1.0 - alpha, j))
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue)

  /** (t, y, level, forecast_err) per grid position, ordered by t;
    * forecast_err is NULL at the first position. */
  def ses(grid: DataFrame, tCol: String, yCol: String,
          alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"ses: alpha=$alpha outside (0,1)")
    // pin the grid: the require, BOTH sides of the triangular
    // self-join, and the close otherwise re-derive the (usually
    // corpus-aggregate) input — the round's scan-count audit class
    val spark = grid.sparkSession
    val gPin = Pinned.checkpoint(
      grid.select(col(tCol).cast("long").as("t"),
          col(yCol).cast("double").as("y"))
        .filter(col("t").isNotNull && col("y").isNotNull))
    val g = gPin.df
    val n = g.count()
    require(n >= 1 && n <= (1 << 12),
      s"ses: $n grid positions outside [1, 4096] — pre-aggregate onto a " +
        "bounded time grid first (the Seasonal idiom)")
    val wts = typedlit(weights(alpha, n.toInt).toSeq)
    val w = Window.orderBy(col("t")) // grid-bounded by the require above
    val idx = g.withColumn("rn", row_number().over(w))
    val terms = idx.as("tt")
      .join(idx.select(col("y").as("yi"), col("rn").as("i")).as("ii"),
        col("i") <= col("rn"))
      .select(col("t"), col("y"), col("rn"), col("i"),
        // greatest(…, 1) totalizes the index: the filter below folds
        // into the BNLJ join condition, where subexpression hoisting
        // evaluates element_at on candidate pairs BEFORE the i <= rn
        // guard (the q253 fused-codegen class) — an i > rn candidate
        // would hit index 0 and crash ANSI; clamped pairs never
        // survive the join condition, so semantics are unchanged
        when(col("i") === 1, element_at(wts, col("rn")))
          .otherwise(lit(alpha) * element_at(wts,
            greatest(col("rn") - col("i") + 1, lit(1)))).as("__w"),
        col("yi"))
      .filter(col("__w") =!= 0.0)
      .withColumn("term", col("__w") * col("yi"))
    val levels = terms.groupBy(col("t"), col("y"), col("rn"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("i"), col("term")))),
          s => s.getField("term")),
        lit(0.0), (acc, x) => acc + x).as("__level"))
    val wl = Window.orderBy(col("rn"))
    val out = levels
      .withColumn("__prev", lag(col("__level"), 1).over(wl))
      .select(col("t"), col("y"), round(col("__level"), 6).as("level"),
        round(col("y") - col("__prev"), 6).as("forecast_err"))
      .orderBy(col("t"))
    import scala.jdk.CollectionConverters._
    try spark.createDataFrame(out.collect().toSeq.asJava, out.schema)
    finally gPin.release()
  }

  /** Holt double exponential smoothing (linear trend) on a time grid —
    * the forecaster [[ses]] cannot be: SES lags any trending series by
    * construction; Holt carries an explicit trend state (Holt 1957;
    * FPP §8.2):
    *
    *   ℓₜ = α·yₜ + (1−α)(ℓₜ₋₁ + bₜ₋₁)
    *   bₜ = β(ℓₜ − ℓₜ₋₁) + (1−β)bₜ₋₁,   ŷₜ = ℓₜ₋₁ + bₜ₋₁
    *
    * with the standard init ℓ₁ = y₁, b₁ = y₂ − y₁ (so ŷ₂ = y₂ and
    * err₂ = 0 — the first informative error is at t₃).
    *
    * Determinism contract: the recursion has NO clean closed form with
    * two smoothing constants (the SES triangular-weights trick does not
    * apply), so the ≤4096-position grid folds DRIVER-SIDE — the same
    * bounded-grid collect every census operator uses — with the exact
    * per-step IEEE tree `α·y + (1−α)·(ℓ+b)` that the oracle's recursive
    * CTE replays verbatim ((1−α) is written as the SUBTRACTION in both
    * engines, never as its own decimal literal — the two parse to
    * different doubles). Rounding happens once, at output (6 dp).
    *
    * Scale shape: the input must already BE a grid (the [[ses]]
    * contract), loudly bounded; one pinned pass derives it, the fold is
    * O(grid) on the driver. */
  def holt(grid: DataFrame, tCol: String, yCol: String,
           alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"holt: alpha=$alpha outside (0,1)")
    require(beta > 0.0 && beta < 1.0, s"holt: beta=$beta outside (0,1)")
    val spark = grid.sparkSession
    val g = grid.select(col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y"))
      .filter(col("t").isNotNull && col("y").isNotNull)
      .orderBy(col("t"))
    val rows = Grids.collectBounded(g, "holt time grid", maxRows = 1 << 12)
      .collect()
    require(rows.length >= 2,
      s"holt: ${rows.length} grid positions (need >= 2 for the trend init)")
    val om = 1.0 - alpha; val ob = 1.0 - beta
    var l = rows(0).getDouble(1)
    var b = rows(1).getDouble(1) - rows(0).getDouble(1)
    val out = new Array[(Long, Double, Double, Double, java.lang.Double)](rows.length)
    out(0) = (rows(0).getLong(0), rows(0).getDouble(1), l, b, null)
    var i = 1
    while (i < rows.length) {
      val y = rows(i).getDouble(1)
      val fcst = l + b
      val lNew = alpha * y + om * (l + b)
      val bNew = beta * (lNew - l) + ob * b
      out(i) = (rows(i).getLong(0), y, lNew, bNew,
        Double.box(y - fcst))
      l = lNew; b = bNew
      i += 1
    }
    spark.createDataFrame(out.toSeq)
      .toDF("t", "y", "__l", "__b", "__e")
      .select(col("t"), col("y"), round(col("__l"), 6).as("level"),
        round(col("__b"), 6).as("trend"),
        round(col("__e"), 6).as("forecast_err"))
      .orderBy(col("t"))
  }

  /** Additive Holt-Winters (triple exponential smoothing) on a time
    * grid — the forecaster [[holt]] cannot be: a daily-cycled hourly
    * series makes Holt chase the cycle as spurious trend; Holt-Winters
    * carries an explicit m-length seasonal state (Winters 1960;
    * FPP §8.3):
    *
    *   ℓₜ = α(yₜ − sₜ₋ₘ) + (1−α)(ℓₜ₋₁ + bₜ₋₁)
    *   bₜ = β(ℓₜ − ℓₜ₋₁) + (1−β)bₜ₋₁
    *   sₜ = γ(yₜ − ℓₜ) + (1−γ)sₜ₋ₘ,   ŷₜ = ℓₜ₋₁ + bₜ₋₁ + sₜ₋ₘ
    *
    * Init (the textbook two-season seed): ℓ₀ = mean(y₁..yₘ),
    * b₀ = (mean(yₘ₊₁..y₂ₘ) − ℓ₀)/m, sᵢ = yᵢ − ℓ₀; the recursion then
    * runs from t = m+1 and only those rows are emitted (the cusum
    * calibration-prefix discipline).
    *
    * Determinism contract (the [[holt]] class): no closed form, so the
    * bounded grid folds DRIVER-SIDE with an exact per-step IEEE tree —
    * ordered-fold means (0-seeded left fold, the q279 discipline),
    * (1−α) written as the subtraction — that the oracle's recursive
    * CTE replays verbatim carrying the m-slot seasonal list. Rounding
    * once at output (6 dp).
    *
    * Scale shape: input must already BE a grid (the [[ses]] contract),
    * ≤4096 positions, ≥ 2m+1 of them; one pinned pass derives it, the
    * fold is O(grid·1) on the driver. */
  def holtWinters(grid: DataFrame, tCol: String, yCol: String,
                  season: Int, alpha: Double, beta: Double,
                  gamma: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"holtWinters: alpha=$alpha outside (0,1)")
    require(beta > 0.0 && beta < 1.0,
      s"holtWinters: beta=$beta outside (0,1)")
    require(gamma > 0.0 && gamma < 1.0,
      s"holtWinters: gamma=$gamma outside (0,1)")
    require(season >= 2, s"holtWinters: season=$season (need >= 2)")
    val spark = grid.sparkSession
    val g = grid.select(col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y"))
      .filter(col("t").isNotNull && col("y").isNotNull)
      .orderBy(col("t"))
    val rows = Grids.collectBounded(g, "holtWinters time grid",
      maxRows = 1 << 12).collect()
    val m = season
    require(rows.length >= 2 * m + 1,
      s"holtWinters: ${rows.length} grid positions (need >= ${2 * m + 1} " +
        s"for the two-season init at season=$m)")
    val ys = rows.map(_.getDouble(1))
    var l = 0.0; var i = 0
    while (i < m) { l += ys(i); i += 1 }
    l /= m.toDouble
    var mean2 = 0.0; i = m
    while (i < 2 * m) { mean2 += ys(i); i += 1 }
    mean2 /= m.toDouble
    var b = (mean2 - l) / m.toDouble
    val seas = Array.tabulate(m)(j => ys(j) - l)
    var head = 0 // seas ring buffer: seas(head) is s_{t-m}
    val out = new Array[(Long, Double, Double, Double, Double, Double)](
      rows.length - m)
    i = m
    while (i < rows.length) {
      val y = ys(i)
      val sOld = seas(head)
      val err = y - (l + b + sOld)
      val lNew = alpha * (y - sOld) + (1.0 - alpha) * (l + b)
      val bNew = beta * (lNew - l) + (1.0 - beta) * b
      val sNew = gamma * (y - lNew) + (1.0 - gamma) * sOld
      out(i - m) = (rows(i).getLong(0), y, lNew, bNew, sNew, err)
      seas(head) = sNew; head = (head + 1) % m
      l = lNew; b = bNew
      i += 1
    }
    spark.createDataFrame(out.toSeq)
      .toDF("t", "y", "__l", "__b", "__s", "__e")
      .select(col("t"), col("y"), round(col("__l"), 6).as("level"),
        round(col("__b"), 6).as("trend"),
        round(col("__s"), 6).as("seasonal"),
        round(col("__e"), 6).as("forecast_err"))
      .orderBy(col("t"))
  }

  /** Croston's method for INTERMITTENT demand (Croston 1972) — the
    * forecaster [[ses]]/[[holt]] are provably wrong for: on a series
    * that is mostly zeros with occasional demand spikes, plain
    * exponential smoothing decays toward zero right after every spike
    * and peaks right before the next (the classic bias), because it
    * smooths the zeros. Croston smooths the two components that
    * actually have structure — nonzero demand SIZE ẑ and the
    * inter-demand INTERVAL p̂ — and forecasts ẑ/p̂ demand per period.
    * The SBA correction (Syntetos–Boylan 2005), (1 − α/2)·ẑ/p̂, removes
    * Croston's known positive bias and ships beside it.
    *
    * Pinned conventions (a replayable engine pins what the literature
    * leaves open): input is the NONZERO demand points (t, z>0) only;
    * ẑ initializes to z₁ and smooths from the 2nd point; p̂ initializes
    * to the FIRST observed interval q₂ and smooths from the 3rd.
    *
    * Exactness: day indices and demands are exact integers; the fold
    * is one fixed IEEE tree in point order — (1 − α) written as the
    * subtraction in both engines — that a recursive-CTE oracle
    * replays. One row out.
    *
    * Scale shape: the nonzero-point series is grid-bounded (2¹²) by
    * contract — at 100 TB the caller aggregates demand per (sku, day)
    * first and folds per sku. */
  def croston(points: DataFrame, tCol: String, zCol: String,
              alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"croston: alpha=$alpha outside (0,1)")
    val spark = points.sparkSession
    val g = points.select(col(tCol).cast("long").as("t"),
        col(zCol).cast("long").as("z"))
      .filter(col("t").isNotNull && col("z").isNotNull)
      .orderBy(col("t"))
    val rows = Grids.collectBounded(g, "croston point grid",
      maxRows = 1 << 12).collect()
    val m = rows.length
    require(m >= 3, s"croston: $m demand points (need >= 3)")
    require(rows.forall(_.getLong(1) > 0),
      "croston: zero/negative demand point — pass NONZERO points only")
    var l = rows(0).getLong(1).toDouble
    var p = 0.0
    var i = 1
    while (i < m) {
      val z = rows(i).getLong(1).toDouble
      val q = (rows(i).getLong(0) - rows(i - 1).getLong(0)).toDouble
      l = alpha * z + (1.0 - alpha) * l
      p = if (i == 1) q else alpha * q + (1.0 - alpha) * p
      i += 1
    }
    val fc = l / p
    val sba = (1.0 - alpha / 2.0) * l / p
    spark.range(1).select(lit(m.toLong).as("n_points"),
      lit(rows(m - 1).getLong(0) - rows(0).getLong(0)).as("span"),
      round(lit(l), 6).as("z_hat"), round(lit(p), 6).as("p_hat"),
      round(lit(fc), 6).as("croston_forecast"),
      round(lit(sba), 6).as("sba_forecast"))
  }
}
