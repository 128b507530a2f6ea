package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the Gumbel block-maxima fit: equivariance
  * (location shift moves μ and every return level by exactly the
  * shift; scaling doubles β), return-level monotonicity, and the loud
  * refusals. These pin the fit without re-deriving the moment formulas
  * in the test. */
class ExtremesSpec extends AnyFunSuite with SparkSuite {

  private def blocks(vals: Seq[Long]) = {
    import spark.implicits._
    // one value per block: block maxima == the values
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("b", "v")
  }

  private val base = {
    val rnd = new scala.util.Random(31)
    Seq.fill(30)(rnd.nextInt(1000).toLong + 500)
  }

  test("location shift: +1000 moves mu and return levels by 1000, beta fixed") {
    val a = Extremes.gumbelBlockMaxima(blocks(base), "b", "v",
      Seq(50L)).head()
    val b = Extremes.gumbelBlockMaxima(blocks(base.map(_ + 1000L)),
      "b", "v", Seq(50L)).head()
    assert(b.getAs[Double]("beta") == a.getAs[Double]("beta"))
    assert(math.abs(b.getAs[Double]("mu") -
      (a.getAs[Double]("mu") + 1000.0)) < 1e-5)
    assert(math.abs(b.getAs[Double]("return_level") -
      (a.getAs[Double]("return_level") + 1000.0)) < 1e-5)
  }

  test("scale: x2 doubles beta; longer return periods give higher levels") {
    val a = Extremes.gumbelBlockMaxima(blocks(base), "b", "v", Seq(50L))
      .head()
    val c = Extremes.gumbelBlockMaxima(blocks(base.map(_ * 2L)), "b", "v",
      Seq(50L)).head()
    assert(math.abs(c.getAs[Double]("beta") -
      2.0 * a.getAs[Double]("beta")) < 1e-5)
    val levels = Extremes.gumbelBlockMaxima(blocks(base), "b", "v",
      Seq(10L, 100L, 1000L)).collect().map(_.getAs[Double]("return_level"))
    assert(levels.sameElements(levels.sorted))
    assert(levels.distinct.length == 3)
  }

  test("block maxima come from a max aggregate, partition-invariant") {
    import spark.implicits._
    // two rows per block: the smaller must not matter
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v), (i.toLong, v - 100L)) }.toDF("b", "v")
    val a = Extremes.gumbelBlockMaxima(rows, "b", "v", Seq(50L)).head()
    val b = Extremes.gumbelBlockMaxima(blocks(base), "b", "v", Seq(50L))
      .head()
    assert(a.toString == b.toString)
    val c = Extremes.gumbelBlockMaxima(rows.repartition(9), "b", "v",
      Seq(50L)).head()
    assert(a.toString == c.toString)
  }

  test("refuses few blocks and constant maxima") {
    assert(intercept[IllegalArgumentException] {
      Extremes.gumbelBlockMaxima(blocks(Seq.fill(10)(5L)), "b", "v",
        Seq(50L))
    }.getMessage.contains("blocks"))
    assert(intercept[IllegalArgumentException] {
      Extremes.gumbelBlockMaxima(blocks(Seq.fill(25)(5L)), "b", "v",
        Seq(50L))
    }.getMessage.contains("constant"))
  }
  test("gpdMomentsFit: an exact Pareto tail reads xi > 0, an " +
      "exponential-ish tail reads xi near 0, a bounded tail xi < 0") {
    import spark.implicits._
    // Pareto(alpha=2) via inverse CDF on a deterministic unit grid:
    // x_i = 1e6 / sqrt(i/n) -> heavy, true xi = 1/alpha = 0.5
    val n = 2000
    val pareto = (1 to n).map(i =>
      (math.round(1e6 / math.sqrt(i.toDouble / n)), i.toLong))
      .toDF("v", "id")
    val xiP = Extremes.gpdMomentsFit(pareto, "v", "id", k = 200)
      .head().getAs[Double]("xi_hat")
    assert(xiP > 0.25, s"xiP=$xiP")
    // exponential via inverse CDF: x_i = -1e6 ln(i/n) -> xi ~ 0
    val expo = (1 to n).map(i =>
      (math.round(-1e6 * math.log(i.toDouble / n)), i.toLong))
      .toDF("v", "id")
    val xiE = Extremes.gpdMomentsFit(expo, "v", "id", k = 200)
      .head().getAs[Double]("xi_hat")
    assert(math.abs(xiE) < 0.2, s"xiE=$xiE")
    // uniform (finite endpoint): xi -> -... negative
    val unif = (1 to n).map(i => (i.toLong * 1000, i.toLong)).toDF("v", "id")
    val xiU = Extremes.gpdMomentsFit(unif, "v", "id", k = 200)
      .head().getAs[Double]("xi_hat")
    assert(xiU < -0.2, s"xiU=$xiU")
    assert(xiP > xiE && xiE > xiU, "the three regimes must order")
  }

  test("gpdMomentsFit: threshold is the (k+1)-th order statistic; " +
      "partition-invariant; refusals") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("v", "id")
    val out = Extremes.gpdMomentsFit(df, "v", "id", k = 16).head()
    assert(out.getAs[Long]("threshold") == 84L) // 17th largest of 1..100
    assert(out.getAs[Long]("k") == 16L)
    val a = Extremes.gpdMomentsFit(df, "v", "id", k = 16).head().toString
    val b = Extremes.gpdMomentsFit(df.repartition(9), "v", "id", k = 16)
      .head().toString
    assert(a == b)
    val flat = (1 to 50).map(i => (7L, i.toLong)).toDF("v", "id")
    assert(intercept[IllegalArgumentException] {
      Extremes.gpdMomentsFit(flat, "v", "id", k = 16)
    }.getMessage.contains("flat tail"))
    assert(intercept[IllegalArgumentException] {
      Extremes.gpdMomentsFit(df.limit(10), "v", "id", k = 16)
    }.getMessage.contains("only"))
  }
}
