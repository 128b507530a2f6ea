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
  /** Peaks-over-threshold GPD fit by the method of moments — the
    * THIRD tail lens next to [[gumbelBlockMaxima]] (block maxima) and
    * Outliers.hillPlot (log-rank slope): model the top-k excesses over
    * the (k+1)-th largest value u as Generalized Pareto, with
    *
    *   ξ̂ = ½·(1 − m²/s²)        σ̂ = ½·m·(m²/s² + 1)
    *
    * from the excess mean m and variance s² (Hosking & Wallis 1987).
    * ξ > 0 is a heavy (Pareto-like) tail — finite moments run out at
    * order 1/ξ; ξ ≈ 0 exponential; ξ < 0 a finite endpoint at
    * u + σ/|ξ| (the "there is a maximum order size" read). Where Hill
    * assumes the heavy case and estimates its index, the GPD moments
    * fit DECIDES the case.
    *
    * Exactness: the top-(k+1) order statistics pin u and the excesses
    * deterministically ((value desc, id) total order; ties at u enter
    * with excess 0 — the standard convention); Σe and Σe² fold as
    * exact decimals off integer inputs; ξ/σ close in one fixed double
    * tree. Refuses zero excess variance (a flat tail has no GPD).
    *
    * Scale shape: one TakeOrderedAndProject of k+1 rows; the moments
    * run on those rows only. */
  def gpdMomentsFit(df: DataFrame, valueCol: String, idCol: String,
                    k: Int = 100): DataFrame = {
    require(k >= 16 && k <= 4096, s"gpdMomentsFit: k=$k outside [16, 4096]")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("__v"), col(idCol).as("__id"))
      .orderBy(col("__v").desc, col("__id"))
      .limit(k + 1)
    val top = rows.collect() // k+1 rows by contract
    require(top.length == k + 1,
      s"gpdMomentsFit: corpus has only ${top.length} rows (need > $k)")
    val u = top.last.getLong(0)
    val ex = top.take(k).map(_.getLong(0) - u)
    val m = ex.map(BigDecimal(_)).sum.toDouble / k
    val s2 = ex.map(e => BigDecimal(e) * BigDecimal(e)).sum.toDouble / k - m * m
    require(s2 > 0,
      s"gpdMomentsFit: zero excess variance over u=$u — flat tail, " +
        "no GPD shape to estimate")
    val r = m * m / s2
    val xi = 0.5 * (1.0 - r)
    val sigma = 0.5 * m * (r + 1.0)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((u, k.toLong, math.floor(m * 10000.0) / 10000.0, xi, sigma))
      .toDF("threshold", "k", "mean_excess", "xi_hat", "sigma_hat")
      .select(col("threshold"), col("k"), col("mean_excess"),
        round(col("xi_hat"), 6).as("xi_hat"),
        (floor(col("sigma_hat") * lit(10000.0)) / lit(10000.0))
          .as("sigma_hat"))
  }
}
