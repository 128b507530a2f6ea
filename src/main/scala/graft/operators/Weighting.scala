package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kish effective sample size under weighting — what a weighted
  * corpus or weighted experiment is REALLY worth: reweighting
  * (importance weights, domain-mix up/down-weights, inverse-propensity
  * weights) inflates variance, and ESS = (Σw)²/Σw² is the equivalent
  * unweighted sample size (Kish 1965 §8.2; the design-effect
  * denominator). A source with 1M documents but ESS 10k is being
  * carried by a handful of heavy weights — the q101/q106 mixture
  * layer's hidden-risk scalar, and the standard sanity gate before
  * trusting any IPW estimate (q259).
  *
  * Exactness: w is integer-scaled (basis points, token counts); Σw
  * and Σw² are exact DECIMAL(38,0) sums, the ESS/deff closes are
  * single double expressions, 6-dp.
  *
  * Scale shape: ONE map-side-combined aggregate onto the groups grid;
  * no windows, no driver work. */
object Weighting {

  /** (group, n, sum_w, ess, ess_ratio, deff) per group — ess_ratio =
    * ESS/n ∈ (0,1], deff = n·Σw²/(Σw)² ≥ 1. */
  def kishEss(df: DataFrame, groupCol: String,
              weightCol: String): DataFrame = {
    val w = col(weightCol).cast("decimal(38,0)")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(w).cast("decimal(38,0)").as("__sw"),
        sum(w * w).cast("decimal(38,0)").as("__sww"))
      .select(col(groupCol), col("n"),
        col("__sw").cast("double").as("sum_w"),
        round(col("__sw").cast("double") * col("__sw").cast("double") /
          col("__sww").cast("double"), 6).as("ess"),
        round(col("__sw").cast("double") * col("__sw").cast("double") /
          (col("__sww").cast("double") * col("n").cast("double")), 6)
          .as("ess_ratio"),
        round(col("n").cast("double") * col("__sww").cast("double") /
          (col("__sw").cast("double") * col("__sw").cast("double")), 6)
          .as("deff"))
      .orderBy(col(groupCol))
  }
}
