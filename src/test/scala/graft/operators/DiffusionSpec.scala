package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the Bass fit: exact parameter recovery on a
  * noiseless planted Bass curve, the honest non-diffusion flag on
  * steady-state arrivals, partition invariance, and refusals. */
class DiffusionSpec extends AnyFunSuite with SparkSuite {

  // exact discrete Bass: N_t = p(m - C) + (q/m)C(m - C), integerized
  // by construction (events = that many rows in period t)
  private def bassEvents(p: Double, q: Double, m: Long, periods: Int) = {
    import spark.implicits._
    var c = 0L
    val rows = (1 to periods).flatMap { t =>
      val n = math.max(0L, math.round(
        p * (m - c) + q / m * c * (m - c)))
      c += n
      Seq.fill(n.toInt)(t.toLong)
    }
    rows.toDF("period")
  }

  test("recovers a planted Bass curve's market size to a few percent") {
    val out = Diffusion.bassFit(bassEvents(0.03, 0.4, 1000L, 20), "period")
      .head()
    assert(out.getAs[Boolean]("bass_shape"))
    val m = out.getAs[Double]("m")
    assert(m > 900 && m < 1100, s"m=$m")
    val p = out.getAs[Double]("p"); val q = out.getAs[Double]("q")
    assert(p > 0.01 && p < 0.06, s"p=$p")
    assert(q > 0.25 && q < 0.55, s"q=$q")
    assert(out.getAs[Double]("peak_t") > 0)
  }

  test("steady-state arrivals read bass_shape = false with NULL params") {
    import spark.implicits._
    // exactly constant arrivals: N_t = 10 for 12 periods -> the
    // quadratic fit is flat (b = c = 0 up to exact arithmetic)
    val flat = (1 to 12).flatMap(t => Seq.fill(10)(t.toLong)).toDF("period")
    val out = Diffusion.bassFit(flat, "period").head()
    assert(!out.getAs[Boolean]("bass_shape"))
    assert(out.isNullAt(out.fieldIndex("m")))
    assert(out.isNullAt(out.fieldIndex("peak_t")))
    assert(out.getAs[Long]("adopters") == 120L)
  }

  test("partition-invariant (decimal ledgers)") {
    val df = bassEvents(0.05, 0.3, 500L, 15)
    val a = Diffusion.bassFit(df, "period").head().toString
    val b = Diffusion.bassFit(df.repartition(9), "period").head().toString
    assert(a == b)
  }

  test("refuses too-short histories") {
    import spark.implicits._
    val short = Seq(1L, 1L, 2L, 3L).toDF("period")
    assert(intercept[IllegalArgumentException] {
      Diffusion.bassFit(short, "period")
    }.getMessage.contains("periods"))
  }
}
