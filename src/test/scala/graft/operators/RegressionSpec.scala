package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for ols2: exact recovery of planted coefficients,
  * R² extremes, the VIF reading on correlated features, the singular
  * guard, and partitioning invariance. */
class RegressionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("recovers planted coefficients exactly on noiseless data") {
    // y = 3 + 2·x1 − 0.5·x2, x1 ⟂ x2 on a grid
    val rows = for (a <- 0 until 10; b <- 0 until 10)
      yield (a.toDouble, b.toDouble, 3.0 + 2.0 * a - 0.5 * b)
    val r = Regression.ols2(rows.toDF("x1", "x2", "y"), "y", "x1", "x2").head()
    assert(math.abs(r.getAs[Double]("b0") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") + 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("vif") - 1.0) < 1e-12) // orthogonal
  }

  test("vif blows up as features correlate; singularity is loud") {
    val near = (0 until 100).map { i =>
      val x1 = i.toDouble
      (x1, x1 + (if (i % 10 == 0) 1.0 else 0.0), x1 * 2)
    }
    val r = Regression.ols2(near.toDF("x1", "x2", "y"), "y", "x1", "x2").head()
    assert(r.getAs[Double]("vif") > 10, s"vif=${r.getAs[Double]("vif")}")
    val exact = (0 until 10).map(i => (i.toDouble, i * 2.0, i * 3.0))
    val ex = intercept[IllegalArgumentException] {
      Regression.ols2(exact.toDF("x1", "x2", "y"), "y", "x1", "x2")
    }
    assert(ex.getMessage.contains("collinear"))
  }

  test("partitioning-invariant (exact sufficient statistics)") {
    val li = graft.Tables.t(spark, sf, "lineitem")
    val a = Regression.ols2(li.repartition(3), "l_extendedprice",
      "l_quantity", "l_discount").head().toString
    val b = Regression.ols2(li.repartition(17, $"l_returnflag"),
      "l_extendedprice", "l_quantity", "l_discount").head().toString
    assert(a == b)
  }
}
