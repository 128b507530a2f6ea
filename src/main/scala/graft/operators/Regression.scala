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
}
