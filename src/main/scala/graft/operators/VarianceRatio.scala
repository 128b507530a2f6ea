package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lo–MacKinlay variance-ratio test (Lo & MacKinlay 1988) — the
  * random-walk read the [[Hurst]] R/S exponent approaches from the
  * rescaled-range side: if increments are uncorrelated, the variance
  * of a q-step change is exactly q times the variance of a 1-step
  * change, so VR(q) = Var(y_t − y_{t−q}) / (q · Var(y_t − y_{t−1}))
  * sits at 1. VR > 1 reads momentum (positive autocorrelation of
  * increments), VR < 1 mean-reversion — and unlike a single H
  * estimate, the VR(q) PROFILE across horizons localizes the scale at
  * which structure lives. The homoskedastic z uses Lo–MacKinlay's
  * asymptotic variance 2(2q−1)(q−1)/(3q·n) for the overlapping-sum
  * estimator.
  *
  * Exactness: the series must already sit on a bounded integer grid
  * (the [[Hurst]]/[[TrendTests]] contract — pre-aggregate first);
  * 1-step and q-step differences are exact longs via lag windows, the
  * sums and sums-of-squares fold as exact DECIMALs, and VR/z close in
  * a fixed double tree per q. Overlapping q-step sums (the standard
  * small-sample-efficient choice) mean each q costs one lag, not a
  * re-partition.
  *
  * Scale shape: one window pass per horizon over GRID rows (bounded
  * by contract), one exact aggregate each — corpus-size work happened
  * upstream in the grid pre-aggregation. */
object VarianceRatio {

  /** One row per horizon q: (q, n, vr, z). `n` = number of 1-step
    * increments. Refuses grids too short for the largest horizon and
    * constant series (VR undefined). */
  def varianceRatio(df: DataFrame, tCol: String, vCol: String,
                    horizons: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 2),
      s"horizons must all be >= 2, got $horizons")
    val g = df.select(col(tCol).as("__t"), col(vCol).cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    Pinned.withCheckpoint(g) { gg =>
      val n0 = gg.count()
      require(n0 >= 16 && n0 <= (1 << 16),
        s"varianceRatio: $n0 grid positions outside [16, 65536] — " +
          "pre-aggregate onto a bounded time grid first")
      val qMax = horizons.max
      require(n0 > qMax * 4,
        s"varianceRatio: grid of $n0 too short for horizon $qMax")
      val w = Window.orderBy(col("__t"))
      def stats(lagBy: Int): (Long, BigDecimal, BigDecimal) = {
        val d = gg.withColumn("__p", lag(col("__v"), lagBy).over(w))
          .filter(col("__p").isNotNull)
          .select((col("__v") - col("__p")).as("__d"))
        val r = d.agg(count(lit(1)).as("n"),
          sum(col("__d").cast("decimal(38,0)")).as("s"),
          sum((col("__d").cast("decimal(38,0)")) * col("__d")).as("ss")).head()
        (r.getLong(0), BigDecimal(r.getDecimal(1)), BigDecimal(r.getDecimal(2)))
      }
      val (n1, s1, ss1) = stats(1)
      // MLE-form variance around each horizon's OWN increment mean (a
      // standard finite-sample variant of Lo-MacKinlay's shared-drift
      // form; under the null both estimate q·sigma^2, and centering
      // per horizon avoids importing edge effects from grid gaps).
      // Differences are POSITION-based on the supplied grid rows — the
      // series contract is the pre-aggregated bounded grid, as in Hurst.
      val mu = s1.toDouble / n1
      val var1 = ss1.toDouble / n1 - mu * mu
      require(var1 > 0,
        "varianceRatio: constant series (zero 1-step variance)")
      val spark = df.sparkSession
      import spark.implicits._
      val rows = horizons.sorted.map { q =>
        val (nq, sq, ssq) = stats(q)
        val muq = sq.toDouble / nq
        val varq = ssq.toDouble / nq - muq * muq
        val vr = varq / (q.toDouble * var1)
        val se = math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * n1))
        val z = (vr - 1.0) / se
        (q, n1, vr, z)
      }
      rows.toDF("q", "n", "vr", "z")
        .select(col("q"), col("n"), round(col("vr"), 6).as("vr"),
          round(col("z"), 6).as("z"))
        .orderBy(col("q"))
    }
  }
}
