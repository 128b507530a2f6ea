package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BacktestSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("hand-computed MASE on a seasonal series with a test-window shift") {
    // period-3 series 10,20,30 repeating for 12 points; the last 3
    // (test) run 12,22,32 — seasonal-naive absolute errors 2,2,2
    val ys = (0 until 9).map(i => Seq(10L, 20L, 30L)(i % 3)) ++
      Seq(12L, 22L, 32L)
    val grid = ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }
      .toDF("t", "y")
    val out = Backtest.seasonalNaive(grid, "t", "y", season = 3,
      testLen = 3).head()
    // train = first 9 rows minus the first (no lag-1): 8 naive errors
    // |20-10|,|30-20|,|10-30| repeating: 10,10,20,10,10,20,10,10 = 100
    assert(out.getAs[Long]("n_train") == 8L)
    assert(out.getAs[Long]("sae_naive") == 100L)
    assert(out.getAs[Long]("n_test") == 3L)
    assert(out.getAs[Long]("sae_model") == 6L)
    val maeM = 6.0 / 3; val maeN = 100.0 / 8
    assert(out.getAs[Double]("mase") == {
      val x = maeM / maeN
      new java.math.BigDecimal(x).setScale(6,
        java.math.RoundingMode.HALF_UP).doubleValue
    })
  }

  test("degenerate inputs refuse loudly") {
    val grid = (0L until 10L).map(t => (t, 5L)).toDF("t", "y")
    // constant series: zero naive MAE
    intercept[IllegalArgumentException] {
      Backtest.seasonalNaive(grid, "t", "y", season = 2, testLen = 2)
    }
    // too short for season + test window
    intercept[IllegalArgumentException] {
      Backtest.seasonalNaive(grid, "t", "y", season = 6, testLen = 5)
    }
    // non-integer metric
    intercept[IllegalArgumentException] {
      Backtest.seasonalNaive(
        (0L until 10L).map(t => (t, t * 1.5)).toDF("t", "y"),
        "t", "y", season = 2, testLen = 2)
    }
  }

  test("partitioning-invariant") {
    val ys = (0 until 60).map(i => (i.toLong, (i % 7 * 10 + i).toLong))
    val df = ys.toDF("t", "y")
    assert(Backtest.seasonalNaive(df.coalesce(1), "t", "y", 7, 10)
      .head().toSeq ==
      Backtest.seasonalNaive(df.repartition(9), "t", "y", 7, 10)
        .head().toSeq)
  }
}
