package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SmoothingSpec extends AnyFunSuite with SparkSuite {

  test("ses matches the sequential recursion") {
    import spark.implicits._
    val ys = Seq(10.0, 12.0, 9.0, 15.0, 11.0, 14.0, 8.0, 13.0)
    val df = ys.zipWithIndex.map { case (y, i) => (i.toLong + 100, y) }
      .toDF("t", "y")
    val got = Smoothing.ses(df, "t", "y", 0.3).collect()
    // sequential reference with the same pinned weights
    val w = Smoothing.weights(0.3, ys.size)
    val lvl = ys.indices.map { t =>
      (0 to t).map { i =>
        val wt = if (i == 0) w(t) else 0.3 * w(t - i)
        wt * ys(i)
      }.sum
    }
    got.zipWithIndex.foreach { case (r, t) =>
      assert(math.abs(r.getDouble(2) - lvl(t)) < 1e-5, s"level at $t")
      if (t == 0) assert(r.isNullAt(3))
      else assert(math.abs(r.getDouble(3) - (ys(t) - lvl(t - 1))) < 1e-5)
    }
  }

  test("ses level converges toward a level shift") {
    import spark.implicits._
    val ys = Seq.fill(20)(5.0) ++ Seq.fill(20)(25.0)
    val df = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }.toDF("t", "y")
    val out = Smoothing.ses(df, "t", "y", 0.3).collect()
    assert(math.abs(out(19).getDouble(2) - 5.0) < 1e-3)
    assert(out(39).getDouble(2) > 24.0)
  }

  test("ses fails loudly on bad alpha and oversize grids") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("t", "y")
    assert(intercept[IllegalArgumentException] {
      Smoothing.ses(df, "t", "y", 1.0)
    }.getMessage.contains("alpha"))
  }

  test("holt matches the textbook recursion and flags the trend") {
    import spark.implicits._
    // a clean linear series: level tracks, trend converges to the slope
    val grid = (1L to 40L).map(t => (t, 10.0 + 3.0 * t)).toDF("t", "y")
    val out = Smoothing.holt(grid, "t", "y", alpha = 0.4, beta = 0.3)
      .orderBy("t").collect()
    // brute-force replay
    var l = 13.0; var b = 3.0
    assert(out(0).getAs[Double]("level") == 13.0)
    assert(out(0).getAs[Double]("trend") == 3.0)
    for (i <- 1 until 40) {
      val y = 10.0 + 3.0 * (i + 1)
      val fcst = l + b
      val lN = 0.4 * y + (1.0 - 0.4) * (l + b)
      val bN = 0.3 * (lN - l) + (1.0 - 0.3) * b
      def r6(x: Double) = new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      assert(out(i).getAs[Double]("level") == r6(lN), s"level@$i")
      assert(out(i).getAs[Double]("trend") == r6(bN), s"trend@$i")
      assert(out(i).getAs[Double]("forecast_err") == r6(y - fcst), s"err@$i")
      l = lN; b = bN
    }
    // on a pure linear series the one-step error is 0 after init
    assert(out.drop(1).forall(_.getAs[Double]("forecast_err") == 0.0))
  }

  test("holt refuses an unbounded or one-point grid") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Smoothing.holt(Seq((1L, 1.0)).toDF("t", "y"), "t", "y", 0.3, 0.2)
    }
    intercept[IllegalArgumentException] {
      Smoothing.holt(spark.range(70000).selectExpr("id AS t",
        "CAST(id AS DOUBLE) AS y"), "t", "y", 0.3, 0.2)
    }
  }

  test("holtWinters: a pure m-cycle is an exact fixpoint (all errors 0)") {
    import spark.implicits._
    // pattern [10,20,30] repeating: l0 = 20, b0 = 0, s = [-10,0,10] —
    // every update reproduces the state, so forecast_err == 0 forever
    // and Holt (which chases the cycle as trend) would not do this
    val ys = (0 until 12).map(i => (i.toLong, Seq(10.0, 20.0, 30.0)(i % 3)))
    val out = Smoothing.holtWinters(ys.toDF("t", "y"), "t", "y",
      season = 3, alpha = 0.3, beta = 0.1, gamma = 0.2).collect()
    assert(out.length == 9) // first season seeds, rest emit
    assert(out.forall(_.getAs[Double]("forecast_err") == 0.0))
    assert(out.forall(_.getAs[Double]("level") == 20.0))
    assert(out.forall(_.getAs[Double]("trend") == 0.0))
    assert(out.map(_.getAs[Double]("seasonal")).toSeq ==
      Seq(-10.0, 0.0, 10.0, -10.0, 0.0, 10.0, -10.0, 0.0, 10.0))
  }

  test("holtWinters: hand-computed first step on a trending series") {
    import spark.implicits._
    // y = t+1, m = 2: l0 = 1.5, b0 = (3.5-1.5)/2 = 1, s = [-0.5, 0.5];
    // t=3 (y=3): err = 3-(1.5+1-0.5) = 1,
    //   lNew = .3*(3-(-0.5)) + .7*2.5 = 1.05+1.75 = 2.8,
    //   bNew = .1*(2.8-1.5) + .9*1 = 1.03,
    //   sNew = .2*(3-2.8) + .8*(-0.5) = -0.36
    val ys = (1 to 8).map(i => (i.toLong, i.toDouble))
    val out = Smoothing.holtWinters(ys.toDF("t", "y"), "t", "y",
      season = 2, alpha = 0.3, beta = 0.1, gamma = 0.2).collect()
    val r = out.head
    assert(r.getAs[Long]("t") == 3L)
    assert(r.getAs[Double]("forecast_err") == 1.0)
    assert(math.abs(r.getAs[Double]("level") - 2.8) < 1e-9)
    assert(math.abs(r.getAs[Double]("trend") - 1.03) < 1e-9)
    assert(math.abs(r.getAs[Double]("seasonal") + 0.36) < 1e-9)
  }

  test("holtWinters: partitioning-invariant; refuses a short grid") {
    import spark.implicits._
    val ys = (1 to 60).map(i =>
      (i.toLong, 10.0 + i * 0.5 + Seq(0.0, 3.0, -1.0, 2.0)(i % 4)))
    val df = ys.toDF("t", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Smoothing.holtWinters(d, "t", "y", 4, 0.3, 0.1, 0.2)
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
    intercept[IllegalArgumentException] {
      Smoothing.holtWinters(df.limit(8), "t", "y", 4, 0.3, 0.1, 0.2)
    }
  }

  test("croston hand-computed three-point fold") {
    import spark.implicits._
    // l: 10 → 8.8 → 8.64; p: init 3 → 3.2; fc = 2.7, sba = 2.43
    val pts = Seq((0L, 10L), (3L, 4L), (7L, 8L)).toDF("day", "z")
    val r = Smoothing.croston(pts.repartition(2), "day", "z", 0.2).head()
    assert(r.getAs[Long]("n_points") == 3L && r.getAs[Long]("span") == 7L)
    assert(math.abs(r.getAs[Double]("z_hat") - 8.64) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_hat") - 3.2) < 1e-9)
    assert(math.abs(r.getAs[Double]("croston_forecast") - 2.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("sba_forecast") - 2.43) < 1e-9)
  }

  test("croston: perfectly regular demand reads exactly z/q per period") {
    import spark.implicits._
    val pts = (0L until 10L).map(i => (i * 2, 5L)).toDF("day", "z")
    val r = Smoothing.croston(pts, "day", "z", 0.3).head()
    assert(r.getAs[Double]("croston_forecast") == 2.5)
  }

  test("croston refuses short series and zero-demand points") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      Smoothing.croston(Seq((0L, 1L), (1L, 2L)).toDF("day", "z"),
        "day", "z", 0.2)
    }.getMessage.contains("points"))
    assert(intercept[IllegalArgumentException] {
      Smoothing.croston(Seq((0L, 1L), (1L, 0L), (2L, 2L))
        .toDF("day", "z"), "day", "z", 0.2)
    }.getMessage.contains("NONZERO"))
  }
}
