package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
  * Mandelbrot & Wallis 1969) — the LONG-RANGE dependence read the
  * suite's short-lag tools cannot give: ACF/PACF (q296/q345) see a few
  * lags, Ljung-Box (q344) tests them jointly, DF (q367) asks unit-root
  * vs mean-reverting — but a series can pass all of those and still be
  * long-range dependent (H > ½: shocks echo across every horizon, so
  * confidence intervals computed under independence are fiction, and
  * naive √n error bars on dashboard aggregates understate truth).
  * H ≈ ½ is the honest random series; H > 0.6 persistent; H < 0.4
  * anti-persistent.
  *
  * Method: for each window size k (powers of two, 8 ≤ k ≤ n/4), the
  * series splits into ⌊n/k⌋ sequential blocks; per block R = range of
  * cumulative deviations from the block mean, S = population std;
  * R/S averages over blocks; Ĥ = OLS slope of ln(R/S) on ln(k).
  *
  * Exactness: block membership and j-indices are exact integers off
  * row_number; cumulative value sums and Σv² are exact (HUGEINT-class)
  * integers; Z_j = cum − j·μ and S² = Σv²/k − μ² evaluate in ONE fixed
  * double tree per row; block means of R/S and the four regression
  * sums accumulate as DECIMAL(38,12) — the whole pipeline is
  * SQL-replayable bit for bit. Zero-variance blocks drop (R/S
  * undefined); a scale losing ALL blocks refuses.
  *
  * Scale shape: the input must already BE a bounded time grid (the
  * Seasonal idiom, 2¹⁶ cap); the grid explodes by |scales| ≤ 13 rows
  * and every window partitions by (k, block). Output: one row per
  * scale (k, blocks, rs) with the fitted `hurst` repeated. */
object Hurst {

  def hurstRs(df: DataFrame, tCol: String, vCol: String): DataFrame = {
    val g = df.select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    Pinned.withCheckpoint(g) { gg =>
      val n = gg.count()
      require(n >= 64 && n <= (1 << 16),
        s"hurstRs: $n grid positions outside [64, 65536] — " +
          "pre-aggregate onto a bounded time grid first")
      val scales = Iterator.iterate(8L)(_ * 2).takeWhile(_ * 4 <= n).toSeq
      val spark = df.sparkSession
      import spark.implicits._
      val ks = scales.toDF("k")
      val base = gg.withColumn("__i",
        row_number().over(Window.orderBy(col("__t"))).cast("long") - 1)
      val ex = base.crossJoin(broadcast(ks))
        .filter(col("__i") <
          col("k") * floor(lit(n) / col("k")).cast("long"))
        .withColumn("__b", floor(col("__i") / col("k")).cast("long"))
      val wb = Window.partitionBy(col("k"), col("__b")).orderBy(col("__i"))
      val full = Window.partitionBy(col("k"), col("__b"))
      val mu = col("__tot").cast("double") / col("k").cast("double")
      val rows = ex
        .withColumn("__cum", sum(col("__v")).over(wb))
        .withColumn("__j", row_number().over(wb).cast("long"))
        .withColumn("__tot", sum(col("__v")).over(full))
        .withColumn("__totq", sum(col("__v").cast("decimal(38,0)")
          * col("__v")).over(full))
        .withColumn("__z",
          col("__cum").cast("double") - col("__j").cast("double") * mu)
        .withColumn("__s2",
          col("__totq").cast("double") / col("k").cast("double") - mu * mu)
      // Constancy is decided EXACTLY (min(v)==max(v) per block), not by
      // the float s2: E[x²]−μ² can cancel to ≤0 for a large-valued
      // near-constant block with genuine variance, and silently dropping
      // such a block would bias the per-scale R/S mean (r16 advisor
      // finding). Truly constant blocks drop (R/S undefined); a
      // NON-constant block whose s2 cancels to ≤0 refuses loudly.
      val perBlock0 = rows.groupBy(col("k"), col("__b"))
        .agg(max(col("__z")).as("__zx"), min(col("__z")).as("__zn"),
          max(col("__s2")).as("__s2"),
          max(col("__v")).as("__vx"), min(col("__v")).as("__vn"))
        .filter(col("__vx") > col("__vn"))
      val cancelled = perBlock0.filter(col("__s2") <= 0).count()
      require(cancelled == 0,
        s"hurstRs: $cancelled non-constant block(s) whose float variance " +
          "cancelled to <= 0 — values too large for double E[x²]−μ²; " +
          "rescale the series (e.g. subtract a base offset) first")
      val perBlock = perBlock0
        .withColumn("__rs",
          (col("__zx") - col("__zn")) / sqrt(col("__s2")))
      val perK = perBlock.groupBy(col("k"))
        .agg(count(lit(1)).as("blocks"),
          sum(col("__rs").cast("decimal(38,12)")).as("__srs"))
        .withColumn("rs",
          col("__srs").cast("double") / col("blocks").cast("double"))
      Pinned.withCheckpoint(perK) { pk =>
        val kept = pk.count()
        require(kept == scales.length,
          s"hurstRs: only $kept of ${scales.length} scales kept blocks " +
            "— the series is (near-)constant at some window size")
        val lnk = log(col("k").cast("double"))
        val reg = pk.agg(count(lit(1)).as("m"),
          sum(lnk.cast("decimal(38,12)")).as("sx"),
          sum(log(col("rs")).cast("decimal(38,12)")).as("sy"),
          sum((lnk * lnk).cast("decimal(38,12)")).as("sxx"),
          sum((lnk * log(col("rs"))).cast("decimal(38,12)")).as("sxy"))
          .head()
        val m = reg.getLong(0)
        val Seq(sx, sy, sxx, sxy) =
          (1 to 4).map(i => BigDecimal(reg.getDecimal(i)).toDouble)
        val hurst = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        val out = pk.select(col("k"), col("blocks"),
          round(col("rs"), 6).as("rs"),
          round(lit(hurst), 6).as("hurst")).orderBy(col("k"))
        Grids.collectBounded(out, "hurstRs scale grid")
      }
    }
  }
}
