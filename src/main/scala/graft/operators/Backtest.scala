package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-origin forecast backtest with MASE — the missing judgment
  * layer over the forecasting family ([[Smoothing]] produces forecasts,
  * the monitors alert on deviations; NOTHING yet says whether a
  * forecaster beats the naive baseline, which is the only number that
  * justifies deploying one). MASE (Hyndman & Koehler 2006) scales the
  * test-window MAE of the candidate by the TRAINING one-step naive MAE,
  * so it is unit-free, season-aware, and defined where percentage
  * errors blow up on zeros:
  *
  *   MASE = mean_test |y_t − ŷ_t|  /  mean_train |y_t − y_{t−1}|
  *
  * The candidate evaluated here is the SEASONAL NAIVE (ŷ_t = y_{t−m})
  * — the baseline every fancier model must beat, and the audit's
  * reference point: MASE < 1 means seasonality alone already beats the
  * drift-naive; a model that cannot beat THIS has no business shipping.
  *
  * Exactness: the grid's values must be integer-scaled (cents — the
  * levene contract), so every absolute error and both error SUMS are
  * exact BIGINTs; the two MAEs and their ratio close in doubles, 6-dp.
  * Positions with no lag-m (or lag-1) reference are excluded from the
  * respective sums — counts are reported so the denominator is
  * auditable.
  *
  * Scale shape: the input must already BE a grid (the [[Smoothing]]
  * contract — corpus rows pre-aggregate onto calendar positions),
  * loudly bounded at 2¹² positions; both windows run on the grid.
  * Gaps are the caller's to fill: lags are ROW lags on the ordered
  * grid. */
object Backtest {

  /** One row: (n_train, n_test, sae_model, sae_naive, mae_model,
    * mae_naive, mase). The last `testLen` positions are the test
    * window; the rest train. */
  def seasonalNaive(grid: DataFrame, tCol: String, yCol: String,
                    season: Int, testLen: Int): DataFrame = {
    require(season >= 1, s"bad season $season")
    require(testLen >= 1, s"bad testLen $testLen")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val yt = grid.schema(yCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(yt),
      s"seasonalNaive: yCol '$yCol' is $yt — integer-scaled only (cents)")
    val spark = grid.sparkSession
    val gPin = Pinned.checkpoint(
      grid.select(col(tCol).cast("long").as("t"),
          col(yCol).cast("long").as("y"))
        .filter(col("t").isNotNull && col("y").isNotNull))
    try {
      val n = gPin.df.count()
      require(n <= (1 << 12),
        s"seasonalNaive: $n grid positions exceed 4096 — pre-aggregate " +
          "onto a bounded time grid first (the Smoothing contract)")
      require(n > testLen + season,
        s"seasonalNaive: $n positions cannot fit season=$season + " +
          s"testLen=$testLen")
      val w = Window.orderBy(col("t")) // grid-bounded by the require
      val lagged = gPin.df
        .withColumn("rn", row_number().over(w))
        .withColumn("__prev", lag(col("y"), 1).over(w))
        .withColumn("__seas", lag(col("y"), season).over(w))
      val cut = n - testLen
      val p = lagged.agg(
        sum(when(col("rn") <= cut && col("__prev").isNotNull, 1L)
          .otherwise(0L)).as("n_train"),
        sum(when(col("rn") > cut && col("__seas").isNotNull, 1L)
          .otherwise(0L)).as("n_test"),
        sum(when(col("rn") > cut && col("__seas").isNotNull,
          abs(col("y") - col("__seas"))).otherwise(0L)).as("sae_model"),
        sum(when(col("rn") <= cut && col("__prev").isNotNull,
          abs(col("y") - col("__prev"))).otherwise(0L)).as("sae_naive"))
        .head()
      val (nTr, nTe) = (p.getLong(0), p.getLong(1))
      require(nTr > 0 && nTe > 0,
        s"seasonalNaive: empty train ($nTr) or test ($nTe) window")
      val maeM = p.getLong(2).toDouble / nTe
      val maeN = p.getLong(3).toDouble / nTr
      require(maeN > 0.0,
        "seasonalNaive: constant training series — MASE undefined")
      spark.range(1).select(lit(nTr).as("n_train"), lit(nTe).as("n_test"),
        lit(p.getLong(2)).as("sae_model"), lit(p.getLong(3)).as("sae_naive"),
        round(lit(maeM), 6).as("mae_model"),
        round(lit(maeN), 6).as("mae_naive"),
        round(lit(maeM / maeN), 6).as("mase"))
    } finally gPin.release()
  }
}
