package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-census quantile regression — the robust-fit complement to
  * OLS (q262) and Theil–Sen (q253): minimise the pinball loss
  * ρ_τ(r) = r·(τ − 1{r<0}) over a (slope, intercept) candidate grid
  * (Koenker & Bassett 1978). τ = 0.5 is median regression — immune to
  * the y-outliers that drag OLS; other τ give conditional-quantile
  * bands (the p90-latency-vs-size fit). The grid census is the
  * [[Stump]] discipline applied to regression: at corpus scale a
  * simplex/IP solver is a driver-side fantasy, while a census is ONE
  * map-side-combined aggregate per pass, exact and replayable.
  *
  * Grid construction is data-driven but deterministic: slopes span
  * the exact-sums ratio Σy/Σx GEOMETRICALLY over ×[2⁻⁴, 2⁴]
  * (√2-spaced — a multiplicative net, because the anchor ratio is
  * itself outlier-inflatable and a ±75% linear net around a 10×-off
  * anchor would miss the true slope entirely; [[weightsFactors]] pins
  * the 17 factors as exact doubles shared with the replay);
  * intercepts span ȳ × [−1, 1] linearly. Both pinned to 6 dp.
  *
  * Exactness: τ enters as a RATIONAL τ = num/den, and the loss
  * factors into τ·S⁺ + (1−τ)·S⁻ with S⁺ = Σ_{r≥0} r and
  * S⁻ = Σ_{r<0} −r — so the per-cell aggregates are pure EXACT
  * DECIMAL sums of residuals (candidates enter pinned at 6 dp;
  * products stay ≤ 31 digits), and the ARGMIN compares the exact
  * integer-scaled num·S⁺ + (den−num)·S⁻ — no float ever decides the
  * winner, no cross-engine tie hazard. One closing double division,
  * 6-dp.
  *
  * Scale shape: the grid replicates each row grid²× through a
  * broadcast nested-loop join, all folding map-side into ≤grid² cells
  * — corpus passes: one for the sums, one for the census. */
object QuantileRegression {

  /** The √2-spaced slope-grid factors 2^((j−(steps−1)/2)/2), exact
    * doubles — shared verbatim with the SQL replay. */
  def slopeFactors(steps: Int): IndexedSeq[Double] =
    (0 until steps).map(j => math.pow(2.0, (j - (steps - 1) / 2) / 2.0))

  /** One row: (tau, slope, intercept, loss, n) — the argmin cell;
    * loss is the mean pinball loss at τ = tauNum/tauDen. */
  def pinballGrid(df: DataFrame, xCol: String, yCol: String,
                  tauNum: Int = 1, tauDen: Int = 2,
                  steps: Int = 17): DataFrame = {
    require(tauNum > 0 && tauNum < tauDen && tauDen <= 100,
      s"bad tau=$tauNum/$tauDen")
    require(steps >= 3 && steps <= 41, s"bad steps=$steps")
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("decimal(18,6)").as("__x"),
        col(yCol).cast("decimal(18,6)").as("__y"))
    val s = u.agg(count(lit(1)).as("n"),
      sum(col("__x")).cast("decimal(38,12)").as("sx"),
      sum(col("__y")).cast("decimal(38,12)").as("sy")).head()
    val n = s.getLong(0)
    require(n >= 2, s"pinballGrid: $n rows")
    val sx = BigDecimal(s.getDecimal(1)); val sy = BigDecimal(s.getDecimal(2))
    require(sx != 0, "pinballGrid: zero x mass — no slope scale")
    def pin(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    val r0 = sy.toDouble / sx.toDouble
    val yBar = sy.toDouble / n
    val slopes = slopeFactors(steps).map(f => pin(r0 * f))
    val icepts = (0 until steps).map(k =>
      pin(yBar * (-1.0 + 2.0 * k / (steps - 1))))
    val spark = df.sparkSession
    import spark.implicits._
    // distinct: pinning can collide grid points; a duplicated cell
    // would double-count its loss and bias the argmin
    val grid = slopes.flatMap(b => icepts.map(a =>
      (b.toPlainString, a.toPlainString))).distinct.toDF("__bs", "__as")
      .select(col("__bs").cast("decimal(12,6)").as("b"),
        col("__as").cast("decimal(12,6)").as("a"))
    val cells = u.crossJoin(broadcast(grid))
      .withColumn("__r",
        (col("__y") - col("a") - col("b") * col("__x"))
          .cast("decimal(32,12)"))
      .groupBy(col("b"), col("a"))
      .agg(
        sum(when(col("__r") >= 0, col("__r"))
          .otherwise(lit(0).cast("decimal(32,12)")))
          .cast("decimal(38,12)").as("__sp"),
        sum(when(col("__r") < 0, -col("__r"))
          .otherwise(lit(0).cast("decimal(32,12)")))
          .cast("decimal(38,12)").as("__sn"))
      // exact integer-scaled pinball: num·S⁺ + (den−num)·S⁻
      .withColumn("__key",
        (col("__sp") * tauNum + col("__sn") * (tauDen - tauNum))
          .cast("decimal(38,12)"))
    cells
      .orderBy(col("__key").asc, col("b").asc, col("a").asc)
      .limit(1)
      .select(lit(tauNum.toDouble / tauDen).as("tau"),
        col("b").cast("double").as("slope"),
        col("a").cast("double").as("intercept"),
        round(col("__key").cast("double") / (n.toDouble * tauDen), 6)
          .as("loss"),
        lit(n).as("n"))
  }
}
