package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spiegelhalter's Z test of calibration (Spiegelhalter 1986) — the
  * INFERENTIAL companion to q224's ECE and q298's Brier decomposition:
  * ECE reports a magnitude with no null distribution (is 0.03 big?
  * depends on n and the p's); Spiegelhalter's Z standardizes exactly,
  * because under perfect calibration E[(y−p)(1−2p)] = 0 and its
  * variance is Σ(1−2p)²p(1−p):
  *
  *   Z = Σᵢ(yᵢ−pᵢ)(1−2pᵢ) / √(Σᵢ(1−2pᵢ)²pᵢ(1−pᵢ))   ~ N(0,1)
  *
  * |Z| > 2 rejects calibration at ~5% regardless of scale — the
  * honest yes/no the magnitude metrics cannot give.
  *
  * Input contract: a GROUPED prediction — each row carries the group's
  * predicted rate `pCol` (0 < p < 1, typically fit on held-out data)
  * and the outcome `yCol`. Degenerate predictions (p ≤ 0 or ≥ 1)
  * refuse loudly: their variance term is 0 while their miscalibration
  * evidence is unbounded — dropping them silently would launder
  * exactly the failures the test exists to catch.
  *
  * Exactness: the test needs only per-(p, y) cell counts — one
  * map-side-combined census onto the distinct-p grid (metadata-bounded
  * when p comes from group rates); numerator and variance terms
  * evaluate once per cell in doubles and accumulate as DECIMAL(38,12).
  * One row: (n, cells, z). */
object CalibrationTest {

  def spiegelhalterZ(df: DataFrame, pCol: String,
                     yCol: String): DataFrame = {
    val u = df.filter(col(pCol).isNotNull && col(yCol).isNotNull)
      .select(col(pCol).cast("double").as("__p"),
        col(yCol).cast("boolean").as("__y"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      u.groupBy(col("__p"), col("__y")).agg(count(lit(1)).as("__n"))
    ) { cells =>
      val grid = cells.count()
      require(grid >= 1 && grid <= (1 << 16),
        s"spiegelhalterZ: $grid (p, y) cells outside [1, 65536] — p " +
          "must be a GROUP rate, not a per-row score")
      val bad = cells.filter(col("__p") <= 0.0 || col("__p") >= 1.0)
        .agg(coalesce(sum(col("__n")), lit(0L))).head().getLong(0)
      require(bad == 0,
        s"spiegelhalterZ: $bad row(s) with degenerate p (<= 0 or >= 1) " +
          "— their variance is 0 while their evidence is unbounded; fix " +
          "the prediction (smooth the group rate) first")
      val yv = when(col("__y"), lit(1.0)).otherwise(lit(0.0))
      val num = (yv - col("__p")) * (lit(1.0) - lit(2.0) * col("__p"))
      val den = (lit(1.0) - lit(2.0) * col("__p")) *
        (lit(1.0) - lit(2.0) * col("__p")) * col("__p") *
        (lit(1.0) - col("__p"))
      val r = cells.agg(sum(col("__n")).as("n"),
        sum((col("__n").cast("double") * num).cast("decimal(38,12)"))
          .as("__num"),
        sum((col("__n").cast("double") * den).cast("decimal(38,12)"))
          .as("__den")).head()
      val n = r.getLong(0)
      val denD = BigDecimal(r.getDecimal(2)).toDouble
      require(denD > 0.0,
        "spiegelhalterZ: zero variance — every p is exactly 1/2-free " +
          "degenerate; nothing to test")
      val z = BigDecimal(r.getDecimal(1)).toDouble / math.sqrt(denD)
      spark.range(1).select(lit(n).as("n"), lit(grid).as("cells"),
        round(lit(z), 6).as("z"))
    }
  }
}
