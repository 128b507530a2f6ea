package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class QuantileRegressionSpec extends AnyFunSuite with SparkSuite {

  test("exact linear data: the true line is a grid point with zero loss") {
    import spark.implicits._
    // y = 2x: r0 = Σy/Σx = 2 exactly, so slope 2.0 is grid point j=8;
    // yBar·0 puts intercept 0.0 at k=8 — the argmin must land there
    val rows = (1L to 100L).map(i => (i.toDouble, 2.0 * i))
    val r = QuantileRegression.pinballGrid(rows.toDF("x", "y"),
      "x", "y").head()
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0 && r.getLong(4) == 100L)
  }

  test("median regression shrugs off gross y-outliers") {
    import spark.implicits._
    // 90 clean points on y = 2x plus 10 wild outliers
    val clean = (1L to 90L).map(i => (i.toDouble, 2.0 * i))
    val wild = (1L to 10L).map(i => (i.toDouble, 10000.0))
    val r = QuantileRegression.pinballGrid((clean ++ wild).toDF("x", "y"),
      "x", "y").head()
    // the pinned grid spans r0·[.25, 1.75] where r0 is inflated by the
    // outliers; the argmin still sits at the cell closest to slope 2
    val slope = r.getDouble(1)
    assert(slope < 4.0, s"slope $slope dragged by outliers")
  }

  test("degenerate inputs fail loudly") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      QuantileRegression.pinballGrid(
        Seq((0.0, 1.0), (0.0, 2.0)).toDF("x", "y"), "x", "y")
    }.getMessage.contains("zero x mass"))
    assert(intercept[IllegalArgumentException] {
      QuantileRegression.pinballGrid(
        Seq((1.0, 1.0)).toDF("x", "y"), "x", "y", tauNum = 3, tauDen = 2)
    }.getMessage.contains("tau"))
  }
}
