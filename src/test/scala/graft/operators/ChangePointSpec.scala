package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for CUSUM: the closed form equals the textbook
  * recursion (the operator's load-bearing identity), a planted mean
  * shift alarms and a clean continuation doesn't, the reset behavior,
  * and the sparse-calibration guard. */
class ChangePointSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Sequential reference: s_t = max(0, s_{t−1} + x_t − μ − k). */
  private def cusumRef(xs: Seq[Double], mu: Double, k: Double): Seq[Double] = {
    var s = 0.0
    xs.map { x => s = math.max(0.0, s + x - mu - k); s }
  }

  test("closed form == sequential recursion on an oscillating series") {
    // ref window: 8 rows of mean 10, sd > 0; then an oscillation that
    // exercises the max(0,·) reset repeatedly
    val ref = Seq(8.0, 12.0, 9.0, 11.0, 10.0, 10.0, 7.0, 13.0)
    val mon = Seq(15.0, 2.0, 1.0, 14.0, 16.0, 3.0, 18.0, 2.0, 2.0, 19.0)
    val all = ref ++ mon
    val df = all.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
    val out = ChangePoint.cusum(df, "t", "v", refLen = 8).collect()
    val n = ref.length
    val mu = ref.sum / n
    val sd = math.sqrt(ref.map(x => (x - mu) * (x - mu)).sum / n)
    val k = BigDecimal(sd * 0.5).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val want = cusumRef(mon, mu, k)
    out.map(_.getAs[Double]("cusum")).zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-6, s"got $got want $w")
    }
  }

  test("a planted persistent +1.5 sigma shift alarms; the clean tail does not") {
    val ref = (0 until 40).map(i => 10.0 + (i % 5) - 2) // mean 10, sd ~sqrt(2)
    val clean = (0 until 30).map(i => 10.0 + (i % 5) - 2)
    val sd = {
      val mu = ref.sum / ref.length
      math.sqrt(ref.map(x => (x - mu) * (x - mu)).sum / ref.length)
    }
    val shifted = (0 until 30).map(i => 10.0 + (i % 5) - 2 + 1.5 * sd)
    val mk = (vs: Seq[Double]) => (ref ++ vs).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
    val cleanOut = ChangePoint.cusum(mk(clean), "t", "v", refLen = 40).collect()
    assert(!cleanOut.exists(_.getAs[Boolean]("alarm")))
    val shiftOut = ChangePoint.cusum(mk(shifted), "t", "v", refLen = 40).collect()
    assert(shiftOut.exists(_.getAs[Boolean]("alarm")))
    // and once alarmed it STAYS accumulated (no spurious reset): the
    // last monitored row carries the maximal statistic
    assert(shiftOut.last.getAs[Double]("cusum") ==
      shiftOut.map(_.getAs[Double]("cusum")).max)
  }

  test("sparse calibration windows fail loudly") {
    val df = Seq((0L, 1.0), (100L, 2.0), (200L, 3.0)).toDF("t", "v")
    val ex = intercept[IllegalArgumentException] {
      ChangePoint.cusum(df, "t", "v", refLen = 50)
    }
    assert(ex.getMessage.contains("observed"))
  }
}
