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

  /** Brute-force Pettitt: U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j). */
  private def pettittRef(xs: Seq[Long]): Seq[Long] =
    (1 to xs.length).map { t =>
      (for (i <- 0 until t; j <- t until xs.length)
        yield (xs(i) - xs(j)).sign.toLong).sum
    }

  test("pettitt: hand-computed level break with the midrank recurrence") {
    // [1,1,1,5,5]: U = [-2,-4,-6,-3,0], K = 6 at t = 3 (the true break)
    val df = Seq(1L, 1L, 1L, 5L, 5L).zipWithIndex
      .map { case (v, i) => (i.toLong + 1, v) }.toDF("t", "v")
    val out = ChangePoint.pettitt(df, "t", "v").collect()
    assert(out.map(_.getAs[Long]("u")).toSeq == Seq(-2L, -4L, -6L, -3L, 0L))
    assert(out.head.getAs[Long]("k") == 6L)
    assert(out.head.getAs[Long]("t_star") == 3L)
    assert(out.count(_.getAs[Boolean]("is_peak")) == 1)
    val p = math.min(1.0, 2.0 * math.exp(-6.0 * 36.0 / (125.0 + 25.0)))
    assert(out.head.getAs[Double]("p_approx") ==
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pettitt recurrence == brute-force double sum (ties included)") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(40)(rnd.nextInt(6).toLong) // heavy ties
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("t", "v")
    val got = ChangePoint.pettitt(df, "t", "v")
      .collect().map(_.getAs[Long]("u")).toSeq
    assert(got == pettittRef(xs))
  }

  test("pettitt: partitioning-invariant; refuses double values") {
    val xs = (1 to 60).map(i => (i.toLong, (i % 9).toLong))
    val df = xs.toDF("t", "v")
    val a = ChangePoint.pettitt(df.coalesce(1), "t", "v")
      .collect().map(_.toString).toSeq
    val b = ChangePoint.pettitt(df.repartition(11), "t", "v")
      .collect().map(_.toString).toSeq
    assert(a == b)
    val dbl = xs.map { case (t, v) => (t, v.toDouble) }.toDF("t", "v")
    val e = intercept[IllegalArgumentException](
      ChangePoint.pettitt(dbl, "t", "v"))
    assert(e.getMessage.contains("integer-scaled"))
  }
}
