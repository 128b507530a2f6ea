package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the Kupiec POF backtest: a stationary series
  * validates (small LR), a regime shift between halves rejects (the
  * test's reason to exist), the temporal-split discipline, and the
  * x = 0 limit handling. */
class BacktestingSpec extends AnyFunSuite with SparkSuite {

  private def series(vals: Seq[Long]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
  }

  test("stationary series: breach rate near nominal, LR below 3.84") {
    val rnd = new scala.util.Random(47)
    val vals = Seq.fill(400)(rnd.nextInt(10000).toLong)
    val r = Backtesting.kupiecPof(series(vals), "t", "v", 19, 20).head()
    assert(r.getAs[Long]("n_train") == 200L &&
      r.getAs[Long]("n_test") == 200L)
    assert(r.getAs[Double]("lr_pof") < 3.84,
      s"lr=${r.getAs[Double]("lr_pof")}")
  }

  test("regime shift: second half jumps 3x, the threshold is rejected") {
    val rnd = new scala.util.Random(53)
    val vals = Seq.fill(200)(rnd.nextInt(10000).toLong) ++
      Seq.fill(200)(rnd.nextInt(10000).toLong * 3)
    val r = Backtesting.kupiecPof(series(vals), "t", "v", 19, 20).head()
    assert(r.getAs[Double]("breach_rate") > 0.3)
    assert(r.getAs[Double]("lr_pof") > 50.0,
      s"lr=${r.getAs[Double]("lr_pof")}")
  }

  test("zero breaches uses the 0*ln(0) = 0 limit (capital-waste side)") {
    // second half collapses to tiny values → x = 0, LR finite positive
    val vals = (1L to 200L).map(_ % 100 + 100) ++ Seq.fill(200)(1L)
    val r = Backtesting.kupiecPof(series(vals), "t", "v", 19, 20).head()
    assert(r.getAs[Long]("breaches") == 0L)
    val lr = r.getAs[Double]("lr_pof")
    assert(lr > 0.0 && !lr.isNaN && !lr.isInfinite, s"lr=$lr")
  }

  test("refuses bad q and short grids") {
    assert(intercept[IllegalArgumentException] {
      Backtesting.kupiecPof(series(Seq.fill(100)(1L)), "t", "v", 1, 20)
    }.getMessage.contains("outside"))
    assert(intercept[IllegalArgumentException] {
      Backtesting.kupiecPof(series((1L to 20L)), "t", "v", 19, 20)
    }.getMessage.contains("grid"))
  }
}
