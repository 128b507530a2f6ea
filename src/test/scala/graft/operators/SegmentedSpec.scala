package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SegmentedSpec extends AnyFunSuite with SparkSuite {

  test("recovers an exact kink: two lines meet at the breakpoint") {
    import spark.implicits._
    // y = 2x for x <= 10; y = 5x - 30 beyond (continuous at x = 10)
    val rows = (1 to 20).map { i =>
      val x = i.toDouble
      (x, if (i <= 10) 2.0 * x else 5.0 * x - 30.0)
    }
    val r = Segmented.fit(rows.toDF("x", "y"), "x", "y").head()
    // the kink point (10, 20) lies on BOTH lines, so splitting at 9 or
    // 10 are equally exact; the deterministic tiebreak picks 9
    assert(r.getDouble(0) == 9.0 || r.getDouble(0) == 10.0,
      s"breakpoint ${r.getDouble(0)}")
    assert(math.abs(r.getAs[Double]("slope_left") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept_left")) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_right") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept_right") + 30.0) < 1e-9)
    assert(r.getAs[Double]("mse_split") == 0.0)
    assert(r.getAs[Double]("mse_gain") > 0.9)
  }

  test("a single straight line gains ~nothing from splitting") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val rows = (1 to 200).map { i =>
      (i.toDouble % 37, 3.0 * (i % 37) + 7.0 + rnd.nextGaussian() * 0.01)
    }
    val r = Segmented.fit(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getAs[Double]("mse_gain") < 0.2,
      s"gain ${r.getAs[Double]("mse_gain")}")
  }

  test("degenerate grids fail loudly") {
    import spark.implicits._
    val two = Seq((1.0, 1.0), (2.0, 2.0)).toDF("x", "y")
    assert(intercept[IllegalArgumentException] {
      Segmented.fit(two, "x", "y")
    }.getMessage.contains("distinct"))
  }
}
