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
}
