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

  test("anova hand-computed: textbook two-group F = 24, any partitioning") {
    import spark.implicits._
    // a={1,2,3}, b={5,6,7}: SSB = 24, SSW = 4, F = (24/1)/(4/4) = 24
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 6L), ("b", 7L)).toDF("g", "x")
    val r = Variance.anovaOneWay(rows.repartition(5), "g", "x").head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("df1") == 1L && r.getAs[Long]("df2") == 4L)
    assert(math.abs(r.getAs[Double]("f_stat") - 24.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("eta_sq") - 24.0 / 28.0) < 1e-6)
  }

  test("anova: equal group means give F exactly 0") {
    import spark.implicits._
    val rows = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 2L))
      .toDF("g", "x")
    assert(Variance.anovaOneWay(rows, "g", "x").head()
      .getAs[Double]("f_stat") == 0.0)
  }

  test("anova refuses fractional values, constant corpus, unbounded groups") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      Variance.anovaOneWay(
        Seq(("a", 1.5), ("b", 2.5)).toDF("g", "x"), "g", "x")
    }.getMessage.contains("integer"))
    assert(intercept[IllegalArgumentException] {
      Variance.anovaOneWay(
        Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "x"),
        "g", "x")
    }.getMessage.contains("constant"))
    // a continuous group key must refuse, not census-collect the corpus
    val wide = (1L to 2000L).map(i => (s"g$i", i)).toDF("g", "x")
    assert(intercept[IllegalArgumentException] {
      Variance.anovaOneWay(wide, "g", "x")
    }.getMessage.contains("outside"))
  }

  test("icc: planted cluster structure reads high; independence reads ~0") {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    // each cluster has its own level ±small noise → ICC near 1
    val clustered = (1 to 200).flatMap { g =>
      val base = rnd.nextInt(10000).toLong
      (1 to 5).map(_ => (g.toLong, base + rnd.nextInt(10)))
    }.toDF("g", "x")
    val hi = Variance.iccOneWay(clustered.repartition(7), "g", "x")
      .head()
    assert(hi.getAs[Double]("icc") > 0.95)
    assert(hi.getAs[Double]("deff") > 4.0) // m̄ = 5, icc ~1 → deff ~5
    // values independent of cluster → ICC ~ 0, deff ~ 1
    val indep = (1 to 200).flatMap { g =>
      (1 to 5).map(_ => (g.toLong, rnd.nextInt(10000).toLong))
    }.toDF("g", "x")
    val lo = Variance.iccOneWay(indep, "g", "x").head()
    assert(math.abs(lo.getAs[Double]("icc")) < 0.1)
    assert(math.abs(lo.getAs[Double]("deff") - 1.0) < 0.5)
  }

  test("icc drops singleton clusters and refuses degenerate input") {
    import spark.implicits._
    // singletons contribute no within info: result equals the no-
    // singleton subset
    val base = (1 to 50).flatMap(g => (1 to 3).map(i =>
      (g.toLong, (g * 7 + i * 13).toLong)))
    val withSingles = (base ++ (100 to 120).map(g => (g.toLong, 5L)))
      .toDF("g", "x")
    val a = Variance.iccOneWay(withSingles, "g", "x").head()
    val b = Variance.iccOneWay(base.toDF("g", "x"), "g", "x").head()
    assert(a.toString == b.toString)
    assert(intercept[IllegalArgumentException] {
      Variance.iccOneWay(
        Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L)).toDF("g", "x"),
        "g", "x")
    }.getMessage.contains("within"))
  }
}
