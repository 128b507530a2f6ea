package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class ConformalSpec extends AnyFunSuite with SparkSuite {

  private lazy val li = graft.Tables.t(spark, sf, "lineitem")
    .withColumn("li_id", col("l_orderkey") * 8 + col("l_linenumber"))

  test("coverage on the held-out split honours the conformal guarantee band") {
    val r = Conformal.olsCoverage(li, "li_id", "l_quantity",
      "l_extendedprice", epsilon = 0.1).head()
    val (nTrain, nCal, nTest) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrain > 0 && nCal >= 9 && nTest > 0)
    assert(r.getDouble(5) > 0, "qhat positive")
    val coverage = r.getAs[Double]("coverage")
    // finite-sample guarantee is >= 0.9 in expectation over splits;
    // allow sampling slack below, none needed above
    assert(coverage > 0.85 && coverage <= 1.0, s"coverage $coverage")
    assert(r.getAs[Double]("target") == 0.9)
  }

  test("a perfectly linear relation gives qhat 0 and full coverage") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i, i.toDouble, 3.0 + 2.0 * i))
    val r = Conformal.olsCoverage(rows.toDF("id", "x", "y"),
      "id", "x", "y", epsilon = 0.1).head()
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 3.0) < 1e-9)
    assert(r.getAs[Double]("qhat") <= 1e-6 + 1e-12)
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("degenerate inputs fail loudly") {
    import spark.implicits._
    val const = (1L to 100L).map(i => (i, 5.0, i.toDouble))
    assert(intercept[IllegalArgumentException] {
      Conformal.olsCoverage(const.toDF("id", "x", "y"), "id", "x", "y")
    }.getMessage.contains("constant"))
    assert(intercept[IllegalArgumentException] {
      Conformal.olsCoverage(const.toDF("id", "x", "y"), "id", "x", "y",
        epsilon = 0.7)
    }.getMessage.contains("epsilon"))
  }
}
