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
}
