package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anytime-valid A/B readout — the mixture sequential probability
  * ratio test (mSPRT) trajectory that makes PEEKING safe: the fixed-n
  * z-test (q274) is only valid at one pre-registered look, but every
  * real dashboard is watched daily, and optional stopping inflates its
  * false-positive rate several-fold. The mSPRT with a normal mixture
  * prior N(0, τ) gives a likelihood ratio whose reciprocal is a
  * p-value valid at EVERY look simultaneously (Johari, Koomen,
  * Pekelis & Walsh, KDD 2017 — the "always-valid inference" industry
  * standard):
  *
  *   Λ_d = √(V_d/(V_d+τ)) · exp(Δ_d²·τ / (2·V_d·(V_d+τ)))
  *   p_anytime(d) = min over looks ≤ d of min(1, 1/Λ)
  *
  * with Δ = p̂₁−p̂₀ and V = p̄(1−p̄)(1/n₀+1/n₁) from the CUMULATIVE
  * counts at day d. p_anytime is monotone nonincreasing by
  * construction — once significant, always significant.
  *
  * Exactness: daily and cumulative arm counts are exact BIGINTs on the
  * calendar grid (one census + grid windows); Δ, V, Λ close in a fixed
  * double tree (√/exp pinned by the identical expression in the
  * replay), and the running minimum is over the 6-dp-ROUNDED per-look
  * values (the q261 compare-the-persisted-value rule) so the
  * significance boundary replays. Output: one row per day with an
  * observation in both arms. */
object Anytime {

  /** (day, n0, n1, x0, x1, delta, v, lambda, p_anytime, significant)
    * at mixture variance `tau` and level `alpha`. */
  def msprtTrajectory(df: DataFrame, dayCol: String, armCol: String,
                      successCol: String, tau: Double = 1e-4,
                      alpha: Double = 0.05): DataFrame = {
    require(tau > 0, s"bad tau=$tau")
    require(alpha > 0 && alpha < 1, s"bad alpha=$alpha")
    val a = col(armCol).cast("int")
    val y = col(successCol).cast("boolean")
    val daily = df.filter(col(dayCol).isNotNull && a.isNotNull &&
        y.isNotNull)
      .groupBy(col(dayCol).as("day"))
      .agg(sum(when(a === 0, 1L).otherwise(0L)).as("__d0"),
        sum(when(a =!= 0, 1L).otherwise(0L)).as("__d1"),
        sum(when(a === 0 && y, 1L).otherwise(0L)).as("__s0"),
        sum(when(a =!= 0 && y, 1L).otherwise(0L)).as("__s1"))
    val w = Window.orderBy(col("day")) // calendar-grid-bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("n0", sum(col("__d0")).over(w))
      .withColumn("n1", sum(col("__d1")).over(w))
      .withColumn("x0", sum(col("__s0")).over(w))
      .withColumn("x1", sum(col("__s1")).over(w))
      .filter(col("n0") > 0 && col("n1") > 0)
      .withColumn("__pp", (col("x0") + col("x1")).cast("double") /
        (col("n0") + col("n1")).cast("double"))
      .filter(col("__pp") > 0 && col("__pp") < 1)
      .withColumn("delta",
        col("x1").cast("double") / col("n1").cast("double") -
          col("x0").cast("double") / col("n0").cast("double"))
      .withColumn("v", col("__pp") * (lit(1.0) - col("__pp")) *
        (lit(1.0) / col("n0").cast("double") +
          lit(1.0) / col("n1").cast("double")))
      .withColumn("lambda",
        sqrt(col("v") / (col("v") + lit(tau))) *
          exp(col("delta") * col("delta") * lit(tau) /
            (lit(2.0) * col("v") * (col("v") + lit(tau)))))
      // per-look p, pinned 6-dp BEFORE the running min (boundary replay)
      .withColumn("__p", round(least(lit(1.0), lit(1.0) / col("lambda")),
        6))
    cum
      .withColumn("p_anytime", min(col("__p")).over(w))
      .select(col("day"), col("n0"), col("n1"), col("x0"), col("x1"),
        round(col("delta"), 6).as("delta"), round(col("v"), 6).as("v"),
        round(col("lambda"), 6).as("lambda"), col("p_anytime"),
        (col("p_anytime") <= alpha).as("significant"))
      .orderBy(col("day"))
  }
}
