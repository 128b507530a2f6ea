package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the rank correlations: hand-computed τ-b and
  * ρ with ties, the ±1 extremes, degenerate-margin NULLs, and
  * robustness vs Pearson on a planted outlier. */
class CorrelationSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("tau-b matches the O(n^2) hand census with ties on both margins") {
    val pts = Seq((0L, 1.0, 5.0), (1L, 2.0, 5.0), (2L, 2.0, 7.0),
      (3L, 3.0, 6.0), (4L, 4.0, 6.0), (5L, 5.0, 9.0))
    val r = Correlation.kendallTauB(pts.toDF("t", "x", "y"), "t", "x", "y")
      .head()
    var conc, disc, tx, ty, txy = 0L
    for (i <- pts.indices; j <- pts.indices if i < j) {
      val dx = math.signum(pts(j)._2 - pts(i)._2)
      val dy = math.signum(pts(j)._3 - pts(i)._3)
      if (dx == 0 && dy == 0) txy += 1
      else if (dx == 0) tx += 1
      else if (dy == 0) ty += 1
      else if (dx == dy) conc += 1 else disc += 1
    }
    assert((r.getAs[Long]("conc"), r.getAs[Long]("disc"),
      r.getAs[Long]("ties_x"), r.getAs[Long]("ties_y"),
      r.getAs[Long]("ties_xy")) == ((conc, disc, tx, ty, txy)))
    val np = pts.length.toLong * (pts.length - 1) / 2
    val want = (conc - disc).toDouble /
      math.sqrt((np - tx - txy).toDouble * (np - ty - txy).toDouble)
    assert(r.getAs[Double]("tau_b") == want)
  }

  test("spearman rho matches average-rank Pearson with ties") {
    val pts = Seq((0L, 1.0, 3.0), (1L, 2.0, 3.0), (2L, 2.0, 5.0),
      (3L, 4.0, 4.0), (4L, 7.0, 9.0))
    val r = Correlation.spearmanRho(pts.toDF("t", "x", "y"), "t", "x", "y")
      .head()
    def avgRanks(v: Seq[Double]): Seq[Double] =
      v.map(x => v.count(_ < x) + (v.count(_ == x) + 1) / 2.0)
    val rx = avgRanks(pts.map(_._2)); val ry = avgRanks(pts.map(_._3))
    val n = rx.length
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val want = cov / math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum *
      ry.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(r.getAs[Double]("rho") - want) < 1e-12)
  }

  test("monotone pairs hit +1/-1; constant margins give NULL") {
    val inc = (0L until 10L).map(i => (i, i.toDouble, i * i.toDouble))
    assert(Correlation.kendallTauB(inc.toDF("t", "x", "y"), "t", "x", "y")
      .head().getAs[Double]("tau_b") == 1.0)
    assert(Correlation.spearmanRho(inc.toDF("t", "x", "y"), "t", "x", "y")
      .head().getAs[Double]("rho") == 1.0)
    val dec = inc.map { case (t, x, y) => (t, x, -y) }
    assert(Correlation.kendallTauB(dec.toDF("t", "x", "y"), "t", "x", "y")
      .head().getAs[Double]("tau_b") == -1.0)
    val const = inc.map { case (t, x, _) => (t, x, 1.0) }
    assert(Correlation.kendallTauB(const.toDF("t", "x", "y"), "t", "x", "y")
      .head().isNullAt(7))
    assert(Correlation.spearmanRho(const.toDF("t", "x", "y"), "t", "x", "y")
      .head().isNullAt(1))
  }

  test("rank methods shrug off the outlier that owns Pearson") {
    // y tracks x except one wild hour; Pearson collapses, ranks don't
    val pts = (0L until 20L).map(i => (i, i.toDouble,
      if (i == 19) -1000.0 else i + 1.0))
    val tau = Correlation.kendallTauB(pts.toDF("t", "x", "y"), "t", "x", "y")
      .head().getAs[Double]("tau_b")
    assert(tau > 0.75, s"tau=$tau")
  }

  test("chatterjeeXi: a perfect parabola reads ~1 on xi where " +
    "Spearman reads ~0 (the non-monotone case)") {
    import spark.implicits._
    val rows = (-40 to 40).map(i => (i.toLong + 100, i.toLong,
      (i * i).toLong))
    val df = rows.toDF("id", "x", "y")
    val xi = Correlation.chatterjeeXi(df, "x", "y", "id").head()
      .getAs[Double]("xi")
    assert(xi > 0.9)
    val rho = Correlation.spearmanRho(
      df.selectExpr("id AS t", "x", "y"), "t", "x", "y").head()
      .getAs[Double]("rho")
    assert(math.abs(rho) < 0.1)
  }

  test("chatterjeeXi: independence reads ~0; hand-check on a tiny case") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val noise = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong)).toDF("id", "x", "y")
    val xiN = Correlation.chatterjeeXi(noise, "x", "y", "id").head()
      .getAs[Double]("xi")
    assert(math.abs(xiN) < 0.2)
    // hand case: x-sorted y = (30, 10, 20): r = (3, 1, 2), sum|dr| = 3,
    // l = (1, 3, 2), sum l(n-l) = 2 + 0 + 2 = 4 -> denom 8,
    // xi = 1 - 3*3/8 = -0.125
    val tiny = Seq((1L, 10L, 30L), (2L, 20L, 10L), (3L, 30L, 20L))
      .toDF("id", "x", "y")
    val r = Correlation.chatterjeeXi(tiny, "x", "y", "id").head()
    assert(r.getAs[Long]("sum_abs_dr") == 3L)
    assert(r.getAs[Long]("denom") == 8L)
    assert(r.getAs[Double]("xi") == -0.125)
  }

  test("chatterjeeXi: partitioning-invariant; refuses constant y") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val df = (1 to 300).map(i => (i.toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(9).toLong)).toDF("id", "x", "y")
    val a = Correlation.chatterjeeXi(df.coalesce(1), "x", "y", "id")
      .head().toSeq
    val b = Correlation.chatterjeeXi(df.repartition(11), "x", "y", "id")
      .head().toSeq
    assert(a == b)
    val const = df.selectExpr("id", "x", "CAST(7 AS LONG) AS y")
    val e = intercept[IllegalArgumentException](
      Correlation.chatterjeeXi(const, "x", "y", "id"))
    assert(e.getMessage.contains("constant"))
  }

  test("tail dependence: comonotone pairs read lambda 1, antithetic read 0") {
    import spark.implicits._
    val mono = (1L to 100L).map(i => (i, i * 10)).toDF("x", "y")
    val rm = Correlation.upperTailDependence(mono, "x", "y", 9, 10).head()
    assert(rm.getAs[Double]("lambda_u") == 1.0)
    assert(rm.getAs[Long]("n_joint") == 10L)
    val anti = (1L to 100L).map(i => (i, 1000L - i)).toDF("x", "y")
    val ra = Correlation.upperTailDependence(anti, "x", "y", 9, 10).head()
    assert(ra.getAs[Double]("lambda_u") == 0.0)
    assert(ra.getAs[Double]("lift") == 0.0)
  }

  test("tail dependence hand-computed with ties at the threshold") {
    import spark.implicits._
    // n=10, rank ceil(9*10/10)=9 → q = 9th smallest; strict > keeps
    // exactly the values above it
    val pts = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L),
      (6L, 6L), (7L, 7L), (8L, 8L), (9L, 9L), (10L, 1L))
    val r = Correlation.upperTailDependence(pts.toDF("x", "y"), "x", "y",
      9, 10).head()
    assert(r.getAs[Long]("q_x") == 9L && r.getAs[Long]("q_y") == 8L)
    // x>9: {10}; y>8: {9}; joint: row (9,9) has x=9 not >9 → 0
    assert(r.getAs[Long]("n_x_exc") == 1L && r.getAs[Long]("n_y_exc") == 1L)
    assert(r.getAs[Long]("n_joint") == 0L)
  }

  test("partial correlation: a pure common-driver association partials to ~0") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // x and y both ride z plus independent noise: r_xy large, partial ~0
    val rows = (0 until 400).map { i =>
      val z = rnd.nextInt(1000).toLong
      (i.toLong, z + rnd.nextInt(50), z + rnd.nextInt(50), z)
    }.toDF("t", "x", "y", "z")
    val r = Correlation.partialPearson(rows.repartition(7), "x", "y", "z")
      .head()
    assert(r.getAs[Double]("r_xy") > 0.9)
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) < 0.15,
      s"partial=${r.getAs[Double]("r_xy_given_z")}")
  }

  test("partial correlation: a direct link survives partialling") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 400).map { i =>
      val z = rnd.nextInt(100).toLong
      val x = rnd.nextInt(1000).toLong + z
      (i.toLong, x, x + rnd.nextInt(30) + z, z)
    }.toDF("t", "x", "y", "z")
    val r = Correlation.partialPearson(rows, "x", "y", "z").head()
    assert(r.getAs[Double]("r_xy_given_z") > 0.9)
  }

  test("partial correlation refuses collinearity with z and constants") {
    import spark.implicits._
    val coll = (1L to 20L).map(i => (i, i, 2 * i)).toDF("x", "y", "z")
    assert(intercept[IllegalArgumentException] {
      Correlation.partialPearson(coll, "x", "y", "z")
    }.getMessage.contains("collinear"))
    val const = (1L to 20L).map(i => (i, i, 7L)).toDF("x", "y", "z")
    assert(intercept[IllegalArgumentException] {
      Correlation.partialPearson(const, "x", "y", "z")
    }.getMessage.contains("constant"))
  }

  test("tail dependence refuses bad p and degenerate margins") {
    import spark.implicits._
    val pts = (1L to 20L).map(i => (i, i)).toDF("x", "y")
    assert(intercept[IllegalArgumentException] {
      Correlation.upperTailDependence(pts, "x", "y", 1, 10)
    }.getMessage.contains("outside"))
    val const = (1L to 20L).map(i => (i, 7L)).toDF("x", "y")
    assert(intercept[IllegalArgumentException] {
      Correlation.upperTailDependence(const, "x", "y", 9, 10)
    }.getMessage.contains("exceedance"))
  }
}
