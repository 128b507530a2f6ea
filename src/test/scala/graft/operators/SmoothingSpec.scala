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
}
