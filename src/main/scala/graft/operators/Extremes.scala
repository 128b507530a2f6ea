package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gumbel extreme-value fit on block maxima — the "how bad is the
  * worst hour we have NOT seen yet" question no quantile operator
  * (q233/q308) can answer: empirical quantiles stop at the observed
  * maximum, while the Fisher–Tippett limit says block maxima of
  * light-tailed series converge to Gumbel, whose fitted curve
  * EXTRAPOLATES to any return period. Method-of-moments fit
  * (Gumbel 1958): β̂ = s·√6/π, μ̂ = x̄ − γ·β̂ (γ Euler–Mascheroni);
  * return level x_T = μ̂ − β̂·ln(−ln(1 − 1/T)) is exceeded once per T
  * blocks on average. The heavy-tail cousin lives in q359's Hill plot
  * — Gumbel is the max-domain fit, Hill the tail-index diagnostic;
  * read together (a Hill α ≲ 2 disqualifies the Gumbel domain).
  *
  * Exactness: block maxima, their count, sum and sum of squares are
  * exact integers (Σmax² in DECIMAL(38,0)); x̄, s², the fit and every
  * return level close in one fixed double tree (γ as the same literal
  * in both engines), SQL-replayable.
  *
  * Scale shape: one map-side-combined max per block, one aggregate
  * over the block grid (calendar-bounded); return periods are a
  * constant list. Output: one row per return period with the fit
  * repeated. */
object Extremes {

  val EulerGamma = 0.5772156649015329

  def gumbelBlockMaxima(df: DataFrame, blockCol: String, valueCol: String,
                        returnPeriods: Seq[Long]): DataFrame = {
    require(returnPeriods.nonEmpty && returnPeriods.forall(_ >= 2),
      "gumbelBlockMaxima: return periods must be >= 2")
    val maxima = df
      .filter(col(blockCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(blockCol).as("__b"))
      .agg(max(col(valueCol).cast("long")).as("__m"))
    val r = maxima.agg(count(lit(1)).as("m"),
      sum(col("__m")).as("s"),
      // cast BEFORE the multiply — a cent-scaled block maximum squared
      // can wrap int64
      sum(col("__m").cast("decimal(38,0)") * col("__m")).as("q")).head()
    val m = r.getLong(0)
    require(m >= 20,
      s"gumbelBlockMaxima: $m blocks (need >= 20 for a moments fit)")
    val sd = r.getLong(1).toDouble
    val qd = BigDecimal(r.getDecimal(2)).toDouble
    val mean = sd / m
    val s2 = (qd - sd * sd / m) / (m - 1).toDouble
    require(s2 > 0.0, "gumbelBlockMaxima: constant block maxima")
    val beta = math.sqrt(s2) * math.sqrt(6.0) / math.Pi
    val mu = mean - EulerGamma * beta
    val spark = df.sparkSession
    import spark.implicits._
    returnPeriods.map { t =>
      val level = mu - beta * math.log(-math.log(1.0 - 1.0 / t))
      (t, m, mu, beta, level)
    }.toDF("return_period", "blocks", "__mu", "__beta", "__lvl")
      .select(col("return_period"), col("blocks"),
        round(col("__mu"), 6).as("mu"), round(col("__beta"), 6).as("beta"),
        round(col("__lvl"), 6).as("return_level"))
      .orderBy(col("return_period"))
  }
}
