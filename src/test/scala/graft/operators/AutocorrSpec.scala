package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AutocorrSpec extends AnyFunSuite with SparkSuite {

  test("alternating series: acf(k) = (-1)^k (n-k)/n for the zero-mean case") {
    import spark.implicits._
    val n = 10
    val rows = (1 to n).map(t => (t.toLong, if (t % 2 == 0) 1.0 else -1.0))
    val out = Autocorr.acf(rows.toDF("t", "y"), "t", "y", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) == 1.0)
    assert(math.abs(out(1L) - (-(n - 1.0) / n)) < 1e-9)
    assert(math.abs(out(2L) - (n - 2.0) / n) < 1e-9)
    assert(math.abs(out(3L) - (-(n - 3.0) / n)) < 1e-9)
  }

  test("matches a brute-force correlogram on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val ys = Seq.fill(60)(rnd.nextInt(50).toDouble)
    val rows = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
    val out = Autocorr.acf(rows.toDF("t", "y"), "t", "y", maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mean = ys.sum / ys.size
    val den = ys.map(y => (y - mean) * (y - mean)).sum
    for (k <- 0 to 5) {
      val num = (0 until ys.size - k)
        .map(t => (ys(t) - mean) * (ys(t + k) - mean)).sum
      assert(math.abs(out(k.toLong) - num / den) < 1e-6, s"lag $k")
    }
  }

  test("constant series fails loudly instead of ANSI dividing by zero") {
    import spark.implicits._
    val rows = (1 to 20).map(t => (t.toLong, 4.0))
    val e = intercept[IllegalArgumentException] {
      Autocorr.acf(rows.toDF("t", "y"), "t", "y", maxLag = 2)
    }
    assert(e.getMessage.contains("constant"))
  }

  test("ljungBox: Q is the cumulative n(n+2)*sum(acf^2/(n-k)) over " +
    "the published acf trajectory") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 100).map(i =>
      (i.toLong, 50.0 + 10.0 * (i % 4) + rnd.nextInt(5)))
    val df = rows.toDF("t", "y")
    val a = Autocorr.acf(df, "t", "y", maxLag = 8).collect()
    val n = a.find(_.getLong(0) == 0L).get.getLong(1)
    val lb = Autocorr.ljungBox(df, "t", "y", maxLag = 8).collect()
    assert(lb.length == 8)
    var cum = 0.0
    lb.foreach { r =>
      val k = r.getAs[Long]("lag")
      val rho = a.find(_.getLong(0) == k).get.getDouble(2)
      assert(r.getAs[Double]("acf") == rho)
      cum += rho * rho / (n - k).toDouble
      val q = BigDecimal(n.toDouble * (n + 2).toDouble * cum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("q_lb") == q)
      assert(r.getAs[Long]("df") == k)
    }
    // a strongly cyclic series is anything but white: Q explodes
    assert(lb.last.getAs[Double]("q_lb") > 50.0)
  }

  test("pacf: equals a reference Durbin-Levinson on the published acf; " +
    "AR(1) cuts off after lag 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    var y = 0.0
    val rows = (0 until 300).map { i =>
      y = 0.6 * y + rnd.nextGaussian()
      (i.toLong, y)
    }
    val df = rows.toDF("t", "y")
    val rho = Autocorr.acf(df, "t", "y", maxLag = 6).collect()
      .filter(_.getLong(0) >= 1).sortBy(_.getLong(0)).map(_.getDouble(2))
    val got = Autocorr.pacf(df, "t", "y", maxLag = 6).collect()
    // reference recursion
    var phi = Array.empty[Double]
    val want = (1 to 6).map { k =>
      var num = 0.0; var den = 0.0
      (1 until k).foreach { j =>
        num += phi(j - 1) * rho(k - j - 1); den += phi(j - 1) * rho(j - 1)
      }
      val pkk = (rho(k - 1) - num) / (1.0 - den)
      phi = (1 until k).map(j => phi(j - 1) - pkk * phi(k - j - 1))
        .toArray :+ pkk
      BigDecimal(pkk).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(got.map(_.getAs[Double]("pacf")).toSeq == want)
    // pacf(1) == acf(1) identically; AR(1): higher lags die off
    assert(got.head.getAs[Double]("pacf") == rho(0))
    assert(rho(0) > 0.4)
    assert(got.drop(1).forall(r => math.abs(r.getAs[Double]("pacf")) < 0.2))
  }

  test("ccf: a planted 3-step lead peaks exactly at lag +3; " +
    "ccf(x, x) at lag 0 is 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val base = (0 until 120).map(_ => rnd.nextGaussian() * 10)
    // y follows x with a 3-position delay (plus small noise)
    val rows = (0 until 117).map(i =>
      (i.toLong, base(i + 3), base(i) + rnd.nextGaussian() * 0.1))
    val df = rows.toDF("t", "x", "y")
    val out = Autocorr.ccf(df, "t", "x", "y", maxLag = 6).collect()
    assert(out.length == 13)
    val best = out.maxBy(_.getAs[Double]("ccf"))
    assert(best.getAs[Long]("lag") == 3L)
    assert(best.getAs[Double]("ccf") > 0.9)
    // n_pairs is n - |lag|
    assert(out.forall(r => r.getAs[Long]("n_pairs") ==
      117L - math.abs(r.getAs[Long]("lag"))))
    val self = Autocorr.ccf(df.selectExpr("t", "x", "x AS y"),
      "t", "x", "y", maxLag = 2).collect()
    assert(self.find(_.getAs[Long]("lag") == 0L).get
      .getAs[Double]("ccf") == 1.0)
  }

  test("ccf: partitioning-invariant; refuses constants") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val df = (0 until 80).map(i =>
      (i.toLong, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
      .toDF("t", "x", "y")
    val a = Autocorr.ccf(df.coalesce(1), "t", "x", "y", 4)
      .collect().map(_.toString).toSeq
    val b = Autocorr.ccf(df.repartition(7), "t", "x", "y", 4)
      .collect().map(_.toString).toSeq
    assert(a == b)
    val const = df.selectExpr("t", "x", "5.0 AS y")
    val e = intercept[IllegalArgumentException](
      Autocorr.ccf(const, "t", "x", "y", 4))
    assert(e.getMessage.contains("zero variance"))
  }
  test("durbinWatson: alternating residuals read DW near 4, a smooth " +
      "ramp with AR(1)-ish noise reads DW well below 2") {
    import spark.implicits._
    // perfectly alternating around a flat trend: e_t = ±1, so
    // sum (e_t - e_{t-1})^2 = sum (±2)^2 = 4(n-1), ss = n -> DW -> 4
    val alt = (0 until 64).map(i => (i.toLong, if (i % 2 == 0) 10L else 8L))
      .toDF("t", "y")
    val dwAlt = Autocorr.durbinWatson(alt, "t", "y").head()
    assert(dwAlt.getAs[Double]("dw") > 3.5, dwAlt.toString)
    assert(dwAlt.getAs[Double]("rho1_implied") < -0.7)
    // positively-autocorrelated residuals: slow sine-ish wave around
    // the trend -> adjacent residuals similar -> DW small
    val wave = (0 until 64).map(i =>
      (i.toLong, 100L + i + math.round(20 * math.sin(i / 8.0))))
      .toDF("t", "y")
    val dwWave = Autocorr.durbinWatson(wave, "t", "y").head()
    assert(dwWave.getAs[Double]("dw") < 1.0, dwWave.toString)
    // von Neumann is DW * n/(n-1) exactly
    assert(dwWave.getAs[Double]("von_neumann") >= dwWave.getAs[Double]("dw"))
  }

  test("durbinWatson: detrending actually happens (a pure ramp is white)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val ramp = (0 until 128).map(i =>
      (i.toLong, 1000L + 7 * i + rnd.nextInt(5))).toDF("t", "y")
    val out = Autocorr.durbinWatson(ramp, "t", "y").head()
    // slope recovered (floor-scaled 4dp, noise pulls it off 7 slightly)
    assert(math.abs(out.getAs[Double]("trend_slope") - 7.0) < 0.1)
    assert(out.getAs[Double]("dw") > 1.5 && out.getAs[Double]("dw") < 2.6)
  }

  test("durbinWatson: partition-invariant; refuses exact lines and " +
      "short grids") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val df = (0 until 100).map(i => (i.toLong, rnd.nextInt(50).toLong))
      .toDF("t", "y")
    val a = Autocorr.durbinWatson(df, "t", "y").head().toString
    val b = Autocorr.durbinWatson(df.repartition(7), "t", "y")
      .head().toString
    assert(a == b)
    val line = (0 until 32).map(i => (i.toLong, 5L + 3 * i)).toDF("t", "y")
    assert(intercept[IllegalArgumentException] {
      Autocorr.durbinWatson(line, "t", "y")
    }.getMessage.contains("zero residual"))
    assert(intercept[IllegalArgumentException] {
      Autocorr.durbinWatson(df.limit(4), "t", "y")
    }.getMessage.contains("outside"))
  }
}
