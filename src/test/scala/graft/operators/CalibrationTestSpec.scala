package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for Spiegelhalter's Z: a hand-computed two-cell
  * case, the calibrated-by-construction null sitting near 0, a planted
  * systematic bias rejecting, and the degenerate-p refusal. */
class CalibrationTestSpec extends AnyFunSuite with SparkSuite {

  test("hand-computed: one group, p = 0.25, observed 1 of 2") {
    import spark.implicits._
    // num = (1−.25)(.5) + (0−.25)(.5) = .25; den = 2·(.5·.5·.25·.75)
    val rows = Seq((0.25, true), (0.25, false)).toDF("p", "y")
    val z = CalibrationTest.spiegelhalterZ(rows, "p", "y")
      .head().getAs[Double]("z")
    val want = 0.25 / math.sqrt(2.0 * 0.5 * 0.5 * 0.25 * 0.75)
    assert(math.abs(z - want) < 1e-6, s"z=$z want=$want")
  }

  test("exactly-calibrated groups read |z| small; a planted bias rejects") {
    import spark.implicits._
    // groups where the observed rate EQUALS p exactly → num = 0 → z = 0
    val calibrated = Seq(0.2, 0.4, 0.6).flatMap { p =>
      (1 to 100).map(i => (p, i <= (p * 100).toInt))
    }.toDF("p", "y")
    assert(CalibrationTest.spiegelhalterZ(calibrated, "p", "y")
      .head().getAs[Double]("z") == 0.0)
    // every group under-predicts by 20 points → strong rejection
    val biased = Seq(0.2, 0.4, 0.6).flatMap { p =>
      (1 to 100).map(i => (p, i <= (p * 100).toInt + 20))
    }.toDF("p", "y")
    val z = CalibrationTest.spiegelhalterZ(biased, "p", "y")
      .head().getAs[Double]("z")
    assert(z > 4.0, s"z=$z")
  }

  test("refuses degenerate p and per-row-unique scores") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      CalibrationTest.spiegelhalterZ(
        Seq((0.0, false), (0.5, true)).toDF("p", "y"), "p", "y")
    }.getMessage.contains("degenerate"))
    val perRow = (1 to 70000).map(i => (i / 1e6, i % 3 == 0))
      .toDF("p", "y")
    assert(intercept[IllegalArgumentException] {
      CalibrationTest.spiegelhalterZ(perRow, "p", "y")
    }.getMessage.contains("cells"))
  }
}
