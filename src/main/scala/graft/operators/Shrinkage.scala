package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical-Bayes beta-binomial shrinkage of per-segment rates
  * (Robbins 1956; the moment-matched beta prior is the standard
  * leaderboard fix) — the estimator the raw per-segment table gets
  * wrong at both ends: a 2/2 segment is NOT a 100% segment, and
  * ranking segments by raw rate crowns the tiny ones. Fit
  * Beta(α, β) on the observed rate spread by method of moments,
  *
  *   α = μ(μ(1−μ)/v − 1),  β = (1−μ)(μ(1−μ)/v − 1)
  *
  * then shrink each segment toward the prior in proportion to its
  * evidence: r̃ = (x + α)/(n + α + β).
  *
  * Exactness: per-segment (n, x) are exact BIGINTs off ONE census;
  * μ and v fold over the bounded segments grid in segment order (the
  * q279 discipline, replayed by the oracle); each shrunk rate is one
  * double expression from exact integers and the two fitted doubles.
  * Degenerate spreads refuse loudly: v = 0 (nothing to fit) and
  * v ≥ μ(1−μ) (overdispersed past what ANY beta explains — a real
  * finding, not a parameter).
  *
  * Scale shape: one map-side-combined census onto the segments grid;
  * the moment fit and the close run on grid rows re-emitted through
  * the [[Grids]] guard. */
object Shrinkage {

  /** One row per segment: (segment, n, x, rate, shrunk, delta) with
    * (alpha, beta, prior_mean) repeated; ordered by segment. `yCol`
    * must be boolean-castable. */
  def ebRates(df: DataFrame, segmentCol: String,
              yCol: String): DataFrame = {
    val spark = df.sparkSession
    Pinned.withCheckpoint(df
      .filter(col(segmentCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(segmentCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(yCol).cast("boolean"), 1L).otherwise(0L)).as("__x"))
    ) { census =>
      val cells = Grids.collectBounded(census, "ebRates segment grid")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      require(cells.length >= 3,
        s"ebRates: ${cells.length} segments (need >= 3 to fit a spread)")
      val k = cells.length
      // ordered folds over the segment grid (both engines replay)
      var mu = 0.0
      cells.foreach { case (_, n, x) => mu += x.toDouble / n.toDouble }
      mu /= k.toDouble
      var v = 0.0
      cells.foreach { case (_, n, x) =>
        val d = x.toDouble / n.toDouble - mu; v += d * d }
      v /= k.toDouble
      require(v > 0.0, "ebRates: all segment rates identical — no " +
        "spread to fit")
      require(v < mu * (1.0 - mu),
        f"ebRates: rate variance $v%.6f >= mu(1-mu) — overdispersed " +
          "past any beta prior; investigate the segmentation instead")
      val c = mu * (1.0 - mu) / v - 1.0
      val alpha = mu * c
      val beta = (1.0 - mu) * c
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.types.{StructType, StructField,
        StringType, LongType, DoubleType}
      val rows = cells.map { case (s, n, x) =>
        val raw = x.toDouble / n.toDouble
        val shrunk = (x.toDouble + alpha) / (n.toDouble + alpha + beta)
        org.apache.spark.sql.Row(s, n, x, raw, shrunk, shrunk - raw,
          alpha, beta, mu)
      }
      spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
        StructField("segment", StringType), StructField("n", LongType),
        StructField("x", LongType), StructField("rate", DoubleType),
        StructField("shrunk", DoubleType),
        StructField("delta", DoubleType),
        StructField("alpha", DoubleType), StructField("beta", DoubleType),
        StructField("prior_mean", DoubleType))))
        .select(col("segment"), col("n"), col("x"),
          round(col("rate"), 6).as("rate"),
          round(col("shrunk"), 6).as("shrunk"),
          round(col("delta"), 6).as("delta"),
          round(col("alpha"), 6).as("alpha"),
          round(col("beta"), 6).as("beta"),
          round(col("prior_mean"), 6).as("prior_mean"))
        .orderBy(col("segment"))
    }
  }
}
