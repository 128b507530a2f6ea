package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Profile-likelihood quantile regression — [[pinballGrid]] with the
    * intercept dimension SOLVED OUT: for a fixed slope b the pinball-
    * optimal intercept is exactly the τ-quantile of the residuals
    * y − b·x (Koenker & Bassett 1978 §3 — the check-function
    * first-order condition), so the search needs |slopes| cells, not
    * |slopes|·|intercepts|, and the intercept is the TRUE conditional
    * optimum instead of the nearest grid point.
    *
    * Execution shape (measured against the alternatives at bench SF:
    * 289-cell decimal census 155 s → naive 3-pass profile 35 s → this
    * form): residuals are PURE LONG arithmetic in 10⁻¹² units
    * (r₁₂ = yᵤ·10⁶ − bᵤ·xᵤ with everything micro-scaled — a loud
    * domain require bounds |y| and |b·x| under 9.2·10⁶ so the longs
    * cannot wrap), floored to micro-units by the pmod identity (exact
    * for negatives); ONE corpus×slopes pass builds per-slope bucket
    * histograms carrying (count, Σr) so the loss reconstructs from
    * cumulative bucket sums plus the located bucket's in-bucket
    * detail — no separate loss pass.
    *
    * Exactness: the per-slope intercept is the exact ⌈τ·n⌉-th order
    * statistic (ExactQuantile two-phase — never a corpus sort); with
    * rational τ the argmin key τ·Σ_{r≥a}(r−a) + (1−τ)·Σ_{r<a}(a−r)
    * scales to exact DECIMAL(38,0) integer arithmetic. */
  def pinballProfile(df: DataFrame, xCol: String, yCol: String,
                     tauNum: Int = 1, tauDen: Int = 2,
                     steps: Int = 17): DataFrame = {
    require(tauNum > 0 && tauNum < tauDen && tauDen <= 100,
      s"bad tau=$tauNum/$tauDen")
    require(steps >= 3 && steps <= 41, s"bad steps=$steps")
    val micro = 1000000L
    // spread the corpus across the session's full parallelism BEFORE the
    // ×slopes fan: a compact parquet input arrives in a handful of
    // splits (sf0.1 lineitem = 3), and without this the entire
    // corpus×slopes fan + partial aggregate serializes onto those few
    // cores — measured 7.5 s → 1.4 s at bench SF. One 16-byte-row
    // shuffle of the corpus, amortized over both fan passes.
    val fanParts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // persist the 16-byte-row projection: the operator makes THREE full
    // passes over it (sums, histogram fan, in-bucket fan) and each one
    // re-paid the parquet scan + decimal cast + spread shuffle (guide
    // §2.4 — share one exchange instead of three). Released before
    // return via the bounded-collect of the 1-row result below.
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(
        (col(xCol).cast("decimal(18,6)") * lit(micro).cast("decimal(7,0)"))
          .cast("long").as("__xU"),
        (col(yCol).cast("decimal(18,6)") * lit(micro).cast("decimal(7,0)"))
          .cast("long").as("__yU"))
      .repartition(fanParts)
      .persist()
    val s = u.agg(count(lit(1)).as("n"),
      sum(col("__xU").cast("decimal(38,0)")).as("sx"),
      sum(col("__yU").cast("decimal(38,0)")).as("sy"),
      max(abs(col("__xU"))).as("mx"), max(abs(col("__yU"))).as("my"))
      .head()
    val n = s.getLong(0)
    require(n >= 2, s"pinballProfile: $n rows")
    val sx = BigDecimal(s.getDecimal(1)); val sy = BigDecimal(s.getDecimal(2))
    val maxAbsXU = s.getLong(3); val maxAbsYU = s.getLong(4)
    require(sx != 0, "pinballProfile: zero x mass — no slope scale")
    def pin(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    val r0 = sy.toDouble / sx.toDouble
    val slopeUs = slopeFactors(steps)
      .map(f => pin(r0 * f).movePointRight(6).longValueExact()).distinct
    // loud long-domain contract: r12 = yU*1e6 - bU*xU must not wrap
    val maxBU = slopeUs.map(math.abs).max
    require(maxAbsYU <= Long.MaxValue / micro / 4 &&
      (maxBU == 0 || maxAbsXU <= Long.MaxValue / maxBU / 4),
      s"pinballProfile: |y| up to ${maxAbsYU / 1e6} or |b*x| up to " +
        s"${maxBU / 1e6 * maxAbsXU / 1e6} exceeds the long micro-unit " +
        "domain (~9.2e6 value units) — rescale the metric first")
    val spark = df.sparkSession
    import spark.implicits._
    val slopeDf = slopeUs.zipWithIndex
      .map { case (bU, i) => (i, bU) }.toDF("__i", "__bU")
    // one corpus×slopes pass: long residuals in micro-units (pmod
    // floor — exact for negatives), bucketed histogram carrying sums
    val r12 = col("__yU") * lit(micro) - col("__bU") * col("__xU")
    val r6 = ((r12 - pmod(r12, lit(micro))) / lit(micro)).cast("long")
    // 2^26 micro-units (~67 value units) per bucket: wide slopes make
    // residual ranges ~1e6 units, so narrower buckets would explode the
    // histogram key space (measured: 2^20 buckets -> ~21M groups and the
    // partial hash-agg dominates; 2^26 -> ~0.3M groups)
    val lowBits = 26
    val hist = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6.as("__r"))
      .groupBy(col("__i"), shiftright(col("__r"), lowBits).as("__bk"))
      .agg(count(lit(1)).as("__c"),
        sum(col("__r").cast("decimal(38,0)")).as("__s"))
    val wb = Window.partitionBy(col("__i")).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__chi", sum(col("__c")).over(wb))
      .withColumn("__shi", sum(col("__s")).over(wb))
    val k = (tauNum.toLong * n + tauDen - 1) / tauDen
    // located bucket per slope + totals (bucket-grid-sized inputs)
    val located = cum
      .filter(lit(k) > col("__chi") - col("__c") && lit(k) <= col("__chi"))
      .select(col("__i"), col("__bk"), (lit(k) - (col("__chi") - col("__c")))
        .as("__rr"),
        (col("__chi") - col("__c")).as("__cntBelow"),
        (col("__shi") - col("__s")).cast("decimal(38,0)").as("__sumBelow"))
    val totals = hist.groupBy(col("__i"))
      .agg(sum(col("__c")).as("__nTot"),
        sum(col("__s")).cast("decimal(38,0)").as("__sTot"))
    // in-bucket exact selection (located buckets only — the second,
    // bucket-local scan)
    val inBucket = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6.as("__r"))
      .join(broadcast(located), Seq("__i"))
      .filter(shiftright(col("__r"), lowBits) === col("__bk"))
      .groupBy(col("__i"), col("__rr"), col("__cntBelow"),
        col("__sumBelow"), col("__r"))
      .agg(count(lit(1)).as("__c"),
        sum(col("__r").cast("decimal(38,0)")).as("__s"))
    val wv = Window.partitionBy(col("__i")).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aRows = inBucket
      .withColumn("__chi", sum(col("__c")).over(wv))
      .withColumn("__shi", sum(col("__s")).over(wv))
      .filter(col("__rr") > col("__chi") - col("__c") &&
        col("__rr") <= col("__chi"))
      .select(col("__i"), col("__r").as("__a"),
        // rows strictly below a: below-bucket prefix + in-bucket prefix
        (col("__cntBelow") + col("__chi") - col("__c")).as("__nMinus"),
        (col("__sumBelow") + col("__shi") - col("__s"))
          .cast("decimal(38,0)").as("__sMinus"))
    val losses = aRows.join(broadcast(totals), Seq("__i"))
      .join(broadcast(slopeDf), Seq("__i"))
      .withColumn("__nPlus", col("__nTot") - col("__nMinus"))
      .withColumn("__sPlus",
        (col("__sTot") - col("__sMinus")).cast("decimal(38,0)"))
      .withColumn("__key",
        ((col("__sPlus") - col("__a").cast("decimal(38,0)") *
          col("__nPlus")) * tauNum +
          (col("__a").cast("decimal(38,0)") * col("__nMinus") -
            col("__sMinus")) * (tauDen - tauNum)).cast("decimal(38,0)"))
    val out = losses
      .orderBy(col("__key").asc, col("__bU").asc)
      .limit(1)
      .select(lit(tauNum.toDouble / tauDen).as("tau"),
        (col("__bU").cast("double") / lit(1e6)).as("slope"),
        round(col("__a").cast("double") / lit(1e6), 6).as("intercept"),
        round(col("__key").cast("double") /
          (n.toDouble * tauDen * 1e6), 6).as("loss"),
        lit(n).as("n"))
    // localize the 1-row argmin (bounded by construction — the PageRank
    // driver-loop precedent) so the corpus cache releases NOW instead of
    // riding the returned plan into the caller's action
    val rows = out.collect().toSeq
    u.unpersist(blocking = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }
}
