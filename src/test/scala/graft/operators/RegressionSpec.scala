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

  test("granger: a planted y_t = x_{t-1} chain reads huge F; pure AR(1) reads small") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // x drives y with one-step lag (plus integer noise)
    val xs = Seq.fill(200)(rnd.nextInt(50).toLong + 10)
    val caused = (1 until 200).map(i =>
      (i.toLong, xs(i), 3 * xs(i - 1) + rnd.nextInt(3).toLong))
    val fCaused = Regression.grangerLag1(
      caused.toDF("t", "x", "y").repartition(7), "t", "x", "y")
      .head().getAs[Double]("f_stat")
    assert(fCaused > 100.0, s"fCaused=$fCaused")
    // x is independent noise; y is its own AR walk
    var y = 100L
    val indep = (0 until 200).map { i =>
      y = y + rnd.nextInt(7) - 3
      (i.toLong, rnd.nextInt(50).toLong, y)
    }
    val fIndep = Regression.grangerLag1(
      indep.toDF("t", "x", "y"), "t", "x", "y")
      .head().getAs[Double]("f_stat")
    assert(fIndep < 6.0, s"fIndep=$fIndep")
  }

  test("granger drops pairs across grid gaps and is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (0 until 100).filter(_ % 10 != 3).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(30).toLong))
    val a = Regression.grangerLag1(rows.toDF("t", "x", "y"), "t", "x", "y")
      .head()
    // 99 candidate steps minus 10 missing-t minus 10 missing-(t−1)
    assert(a.getAs[Long]("n") == 79L)
    val b = Regression.grangerLag1(
      rows.toDF("t", "x", "y").repartition(13), "t", "x", "y").head()
    assert(a.toString == b.toString)
  }

  test("dickey-fuller: a mean-reverting series reads deep-negative t; a random walk does not") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val white = (0 until 300).map(i => (i.toLong, rnd.nextInt(100).toLong))
    val tWhite = Regression.dickeyFuller(white.toDF("t", "y"), "t", "y")
      .head().getAs[Double]("t_stat")
    assert(tWhite < -10.0, s"tWhite=$tWhite")
    var y = 1000L
    val walk = (0 until 300).map { i =>
      y += rnd.nextInt(11) - 5; (i.toLong, y)
    }
    val r = Regression.dickeyFuller(walk.toDF("t", "y"), "t", "y").head()
    assert(r.getAs[Double]("t_stat") > -3.5, s"tWalk=${r.getAs[Double]("t_stat")}")
    assert(math.abs(r.getAs[Double]("rho") - 1.0) < 0.1)
  }

  test("ols1 recovers an exact line and refuses constant margins") {
    import spark.implicits._
    val line = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x", "y")
    val r = Regression.ols1(line.repartition(7), "x", "y").head()
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(intercept[IllegalArgumentException] {
      Regression.ols1(
        (1 to 10).map(i => (3.0, i.toDouble)).toDF("x", "y"), "x", "y")
    }.getMessage.contains("constant"))
  }

  test("granger/dickey-fuller refuse unbounded or degenerate grids") {
    import spark.implicits._
    val tiny = Seq((0L, 1L, 1L), (1L, 1L, 1L)).toDF("t", "x", "y")
    assert(intercept[IllegalArgumentException] {
      Regression.grangerLag1(tiny, "t", "x", "y")
    }.getMessage.contains("grid"))
    val constY = (0L until 20L).map(i => (i, i % 5, 7L)).toDF("t", "x", "y")
    assert(intercept[IllegalArgumentException] {
      Regression.grangerLag1(constY, "t", "x", "y")
    }.getMessage.contains("constant"))
    val constLag = (0L until 20L).map(i => (i, 7L)).toDF("t", "y")
    assert(intercept[IllegalArgumentException] {
      Regression.dickeyFuller(constLag, "t", "y")
    }.getMessage.contains("constant"))
  }
}
