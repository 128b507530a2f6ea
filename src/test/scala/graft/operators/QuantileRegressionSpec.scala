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

  test("profile path: exact line recovered with the TRUE optimal intercept") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i.toDouble, 3.0 + 2.0 * i))
    val r = QuantileRegression.pinballProfile(rows.toDF("x", "y"),
      "x", "y").head()
    // slope grid anchors at sy/sx (≈2.06, no exact 2.0 point), but the
    // profiled intercept is the exact median residual at the chosen
    // slope — the line must reproduce near-zero loss at the best cell
    assert(r.getDouble(3) < 60.0, s"loss ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(1) - 2.0) < 0.5)
  }

  test("profile beats the census at its own slope (intercept is optimal)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1L to 300L).map(i =>
      (i.toDouble, 5.0 + 2.0 * i + rnd.nextInt(20)))
    val df = rows.toDF("x", "y")
    val census = QuantileRegression.pinballGrid(df, "x", "y").head()
    val profile = QuantileRegression.pinballProfile(df, "x", "y").head()
    assert(profile.getDouble(3) <= census.getDouble(3) + 1e-9,
      s"profile ${profile.getDouble(3)} vs census ${census.getDouble(3)}")
  }

  test("profile handles negative residual domains (negative intercepts)") {
    import spark.implicits._
    // y = x - 50: residuals at every slope are mostly negative
    val rows = (1L to 200L).map(i => (i.toDouble, i - 50.0))
    val r = QuantileRegression.pinballProfile(rows.toDF("x", "y"),
      "x", "y").head()
    assert(r.getDouble(2) < 0.0, s"intercept ${r.getDouble(2)}")
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
