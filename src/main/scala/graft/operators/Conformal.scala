package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction-interval calibration — the
  * distribution-free uncertainty layer over the trained-model family
  * (q262/q263/q276 produce point predictions; this audits "how wide
  * must the band be for 90% coverage, and does it HOLD on fresh
  * data"): fit on a train split, take q̂ = the ⌈(n+1)(1−ε)⌉-th order
  * statistic of calibration residuals, and the interval ŷ ± q̂ covers
  * a fresh point with probability ≥ 1−ε with NO distributional
  * assumptions (Vovk et al. 2005; Lei et al. JASA 2018 — split
  * conformal).
  *
  * Construction: deterministic hash split (train/cal/test =
  * buckets {0,1}/2/3 of the house Knuth hash); model = one-feature
  * OLS by exact decimal sufficient statistics (the q262 discipline,
  * closed in a fixed double tree); residuals |y − ŷ| pinned to
  * micro-units (floor(r·10⁶) — the q261 "compare the persisted
  * rounded value" rule), so the order statistic and every coverage
  * comparison are exact INTEGER operations; q̂ selection uses
  * [[ExactQuantile.globalRanks]] (distributed, never a driver sort).
  *
  * Scale shape: three corpus passes (sufficient statistics; residual
  * rank; coverage count), all map-side-combined; no windows, no
  * collected residual lists. Output: one row. */
object Conformal {

  /** One row: (n_train, n_cal, n_test, slope, intercept, qhat,
    * covered, coverage, target). */
  def olsCoverage(df: DataFrame, idCol: String, xCol: String, yCol: String,
                  epsilon: Double = 0.1): DataFrame = {
    require(epsilon > 0.0 && epsilon < 0.5, s"bad epsilon=$epsilon")
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(idCol).isNotNull)
      .select(Splits.hashBucket(col(idCol), 4).as("__b"),
        col(xCol).cast("decimal(18,6)").as("__x"),
        col(yCol).cast("decimal(18,6)").as("__y"))
    val s = u.filter(col("__b") <= 1).agg(count(lit(1)).as("n"),
      sum(col("__x")).cast("decimal(38,12)").as("sx"),
      sum(col("__y")).cast("decimal(38,12)").as("sy"),
      sum(col("__x") * col("__x")).cast("decimal(38,12)").as("sxx"),
      sum(col("__x") * col("__y")).cast("decimal(38,12)").as("sxy")).head()
    val nTrain = s.getLong(0)
    require(nTrain >= 3, s"conformal: train split has $nTrain rows")
    val Seq(sx, sy, sxx, sxy) =
      (1 to 4).map(i => BigDecimal(s.getDecimal(i)))
    // centered moments in the double domain — the q262 replay contract
    val cxx = sxx.toDouble * nTrain - sx.toDouble * sx.toDouble
    val cxy = sxy.toDouble * nTrain - sx.toDouble * sy.toDouble
    require(cxx != 0.0, "conformal: constant feature — no fit")
    val slope = cxy / cxx
    val intercept = (sy.toDouble - slope * sx.toDouble) / nTrain
    // residuals pinned to exact micro-units: every comparison integer
    def residU = floor(abs(col("__y").cast("double") -
      (lit(intercept) + lit(slope) * col("__x").cast("double"))) *
      lit(1e6)).cast("long")
    val cal = u.filter(col("__b") === 2).select(residU.as("__r"))
    val nCal = cal.count()
    require(nCal >= 9, s"conformal: calibration split has $nCal rows")
    val k = math.min(nCal,
      math.ceil((nCal + 1) * (1.0 - epsilon)).toLong)
    val qhatU = ExactQuantile.globalRanks(cal, "__r", Seq(k), lowBits = 8)
      .head().getLong(1)
    val test = u.filter(col("__b") === 3)
      .agg(count(lit(1)).as("n_test"),
        sum(when(residU <= qhatU, 1L).otherwise(0L)).as("covered"))
    test.select(lit(nTrain).as("n_train"), lit(nCal).as("n_cal"),
      col("n_test"),
      round(lit(slope), 6).as("slope"),
      round(lit(intercept), 6).as("intercept"),
      round(lit(qhatU.toDouble / 1e6), 6).as("qhat"),
      col("covered"),
      round(col("covered").cast("double") / col("n_test").cast("double"), 6)
        .as("coverage"),
      lit(1.0 - epsilon).as("target"))
  }
}
