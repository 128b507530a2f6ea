package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class VarianceSpec extends AnyFunSuite with SparkSuite {

  test("levene hand-computed: W = 4 for one spread and one constant group") {
    import spark.implicits._
    // a = {0,10,20}: z-mean 20/3; b = {5,5,5}: z-mean 0
    // between = within = 200/3 -> W = (6-2)/(2-1) * 1 = 4
    val rows = Seq(("a", 0L), ("a", 10L), ("a", 20L),
      ("b", 5L), ("b", 5L), ("b", 5L)).toDF("g", "x")
    val out = Variance.levene(rows, "g", "x").collect()
    assert(out.length == 2)
    val r = out.head
    assert(math.abs(r.getAs[Double]("z_mean") - 20.0 / 3.0) < 1e-6)
    out.foreach { o =>
      assert(math.abs(o.getAs[Double]("w") - 4.0) < 1e-6)
      assert(o.getAs[Long]("df1") == 1L && o.getAs[Long]("df2") == 4L)
    }
  }

  test("levene: equal spreads give W near zero") {
    import spark.implicits._
    val rows = (1L to 50L).flatMap(i =>
      Seq(("a", i % 10), ("b", 100L + i % 10))).toDF("g", "x")
    val w = Variance.levene(rows, "g", "x").head().getAs[Double]("w")
    assert(w < 1e-9, s"w=$w")
  }

  test("levene fails loudly on fractional values and all-constant groups") {
    import spark.implicits._
    val frac = Seq(("a", 1.5), ("a", 2.5), ("b", 1.0), ("b", 2.0))
      .toDF("g", "x")
    assert(intercept[IllegalArgumentException] {
      Variance.levene(frac, "g", "x")
    }.getMessage.contains("integer"))
    val const = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L))
      .toDF("g", "x")
    assert(intercept[IllegalArgumentException] {
      Variance.levene(const, "g", "x")
    }.getMessage.contains("constant"))
  }
}
