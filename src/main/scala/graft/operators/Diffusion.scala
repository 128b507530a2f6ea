package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bass diffusion fit (Bass 1969) by the discrete-analog regression —
  * the adoption-curve model behind every "when does this product
  * saturate" forecast: per period, new adopters
  *
  *   N_t = p·(m − C_{t−1}) + (q/m)·C_{t−1}·(m − C_{t−1})
  *       = a + b·C_{t−1} + c·C_{t−1}²
  *
  * with innovation p, imitation q, market size m recovered from the
  * quadratic's coefficients: m = (−b − √(b²−4ac))/(2c) (the positive
  * root under c < 0), p = a/m, q = b + p; peak adoption sits at
  * t* = ln(q/p)/(p+q) when both are positive.
  *
  * A real diffusion shape requires c < 0 (saturation bends the curve
  * down) and a positive discriminant. The fit does NOT refuse the
  * alternative: `bass_shape` = false with NULL (m, p, q, peak) is the
  * honest answer "these arrivals are not diffusing" (a steady-state
  * uniform arrival stream — most synthetic feeds — answers exactly
  * that), and a refusal would make steady arrivals look like an error
  * instead of a finding.
  *
  * Exactness: the (N_t, C_{t−1}) table is exact longs off one census
  * + one cumsum window; the 3-regressor normal equations accumulate
  * as the [[Regression.ols2]] decimal ledgers (x1 = C, x2 = C², both
  * exact decimals) and solve by the same Cramer close; the Bass
  * closes (root, p, q, ln) are one fixed double tree. Scale shape:
  * one census onto the bounded period grid, one ledger aggregate. */
object Diffusion {

  /** One row: (n_periods, adopters, a, b, c, bass_shape, m, p, q,
    * peak_t) — m/p/q/peak NULL unless the quadratic has the Bass
    * shape. `df` must be one row per adoption EVENT with a numeric
    * period column (the caller pre-assigns periods). */
  def bassFit(df: DataFrame, periodCol: String): DataFrame = {
    val counts = df.filter(col(periodCol).isNotNull)
      .groupBy(col(periodCol).cast("long").as("__p"))
      .agg(count(lit(1)).as("__n"))
    Pinned.withCheckpoint(counts) { cc =>
      val periods = cc.count()
      require(periods >= 6 && periods <= (1L << 12),
        s"bassFit: $periods periods outside [6, 4096] — use a coarser grid")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("__p"))
        .rowsBetween(Long.MinValue, -1)
      val rows = cc
        .withColumn("__c", coalesce(sum(col("__n")).over(w), lit(0L)))
        .select(col("__n").cast("decimal(18,6)").as("__y"),
          col("__c").cast("decimal(18,6)").as("__x1"),
          (col("__c") * col("__c")).cast("decimal(18,6)").as("__x2"))
      def dsum(c: org.apache.spark.sql.Column) = sum(c).cast("decimal(38,12)")
      val r = rows.agg(count(lit(1)).as("n"),
        dsum(col("__x1")).as("s1"), dsum(col("__x2")).as("s2"),
        dsum(col("__y")).as("sy"),
        dsum((col("__x1") * col("__x1")).cast("decimal(38,12)")).as("s11"),
        dsum((col("__x2") * col("__x2")).cast("decimal(38,12)")).as("s22"),
        dsum((col("__x1") * col("__x2")).cast("decimal(38,12)")).as("s12"),
        dsum((col("__x1") * col("__y")).cast("decimal(38,12)")).as("s1y"),
        dsum((col("__x2") * col("__y")).cast("decimal(38,12)")).as("s2y"))
        .head()
      val n = r.getLong(0)
      val Seq(s1, s2, sy, s11, s22, s12, s1y, s2y) =
        (1 to 8).map(i => BigDecimal(r.getDecimal(i)))
      // centered 2x2 Cramer solve, the ols2 closing tree
      def cm(ij: BigDecimal, i: BigDecimal, j: BigDecimal): Double =
        ij.toDouble * n - i.toDouble * j.toDouble
      val c11 = cm(s11, s1, s1); val c22 = cm(s22, s2, s2)
      val c12 = cm(s12, s1, s2)
      val c1y = cm(s1y, s1, sy); val c2y = cm(s2y, s2, sy)
      val det = c11 * c22 - c12 * c12
      require(det != 0.0,
        "bassFit: singular design (cumulative adopters and their square " +
          "are collinear — a degenerate two-point history)")
      val b = (c1y * c22 - c2y * c12) / det
      val c = (c2y * c11 - c1y * c12) / det
      val a = (sy.toDouble - b * s1.toDouble - c * s2.toDouble) / n
      val disc = b * b - 4.0 * a * c
      val shaped = c < 0.0 && disc > 0.0
      val (m, p, q, peak) = if (shaped) {
        val mm = (-b - math.sqrt(disc)) / (2.0 * c)
        val pp = a / mm
        val qq = b + pp
        val pk = if (pp > 0 && qq > 0) math.log(qq / pp) / (pp + qq)
          else Double.NaN
        (Some(mm), Some(pp), Some(qq),
          if (pk.isNaN) None else Some(pk))
      } else (None, None, None, None)
      val total = cc.agg(coalesce(sum(col("__n")), lit(0L))).head().getLong(0)
      val spark = df.sparkSession
      import spark.implicits._
      Seq((n, total, a, b, c, shaped, m, p, q, peak))
        .toDF("n_periods", "adopters", "a", "b", "c", "bass_shape",
          "m", "p", "q", "peak_t")
        .select(col("n_periods"), col("adopters"),
          (floor(col("a") * lit(10000.0)) / lit(10000.0)).as("a"),
          round(col("b"), 6).as("b"), round(col("c"), 9).as("c"),
          col("bass_shape"),
          (floor(col("m") * lit(10000.0)) / lit(10000.0)).as("m"),
          round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
          round(col("peak_t"), 6).as("peak_t"))
    }
  }
}
