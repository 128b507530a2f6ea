package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AgreementSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed kappa: 3 items x 2 raters, mixed agreement") {
    // A: (x,x)  B: (x,y)  C: (y,y) -> S=10, N=3, n=2, T=18
    // Pbar=(10-6)/6=2/3, Pe=18/36=1/2, kappa=(2/3-1/2)/(1/2)=1/3
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "x"), ("B", 1, "y"),
      ("C", 0, "y"), ("C", 1, "y")).toDF("item", "rater", "label")
    val r = Agreement.fleissKappa(df, "item", "rater", "label").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 10L && r.getLong(4) == 18L)
    assert(math.abs(r.getDouble(5) - 1.0 / 3.0) < 1e-12)
  }

  test("perfect agreement with plural categories gives kappa 1") {
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "y"), ("B", 1, "y"))
      .toDF("item", "rater", "label")
    assert(Agreement.fleissKappa(df, "item", "rater", "label").head().getDouble(5) == 1.0)
  }

  test("degenerate single-category design yields NULL, not 1") {
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "x"), ("B", 1, "x"))
      .toDF("item", "rater", "label")
    assert(Agreement.fleissKappa(df, "item", "rater", "label").head().isNullAt(5))
  }

  test("incomplete design fails loudly") {
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "x"))
      .toDF("item", "rater", "label")
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(df, "item", "rater", "label")
    }
    assert(e.getMessage.contains("complete design"))
  }

  test("duplicate (item, rater) rows fail loudly") {
    val df = Seq(("A", 0, "x"), ("A", 0, "y"), ("B", 0, "x"), ("B", 1, "x"))
      .toDF("item", "rater", "label")
    intercept[IllegalArgumentException] {
      Agreement.fleissKappa(df, "item", "rater", "label")
    }
  }

  test("kappa is invariant to input partitioning") {
    val rows = (1 to 50).flatMap(i => (0 to 2).map(r =>
      (s"i$i", r, if ((i * 3 + r) % 7 < 2) "b" else "a")))
    val df = rows.toDF("item", "rater", "label")
    val a = Agreement.fleissKappa(df, "item", "rater", "label").head().getDouble(5)
    val b = Agreement.fleissKappa(df.repartition(13), "item", "rater", "label")
      .head().getDouble(5)
    assert(a == b)
  }

  /** Independent reference: the textbook coincidence-matrix form with
    * double 1/(m−1) weights (Krippendorff 2004 §11.3) — a different
    * formulation than the operator's lcm-scaled integers. */
  private def alphaRef(table: Seq[(Int, String, Int)]): Double = {
    val units = table.groupBy(_._1).view.mapValues(_.map(_._3))
      .filter(_._2.length >= 2).toMap
    val cats = units.values.flatten.toSet.toSeq.sorted
    val o = scala.collection.mutable.Map.empty[(Int, Int), Double]
      .withDefaultValue(0.0)
    units.values.foreach { ls =>
      val m = ls.length; val c = ls.groupBy(identity).view.mapValues(_.length)
      for (a <- cats; b <- cats) {
        val n = c.getOrElse(a, 0) * (c.getOrElse(b, 0) - (if (a == b) 1 else 0))
        if (n > 0) o((a, b)) += n.toDouble / (m - 1)
      }
    }
    val nc = cats.map(a => a -> cats.map(b => o((a, b))).sum).toMap
    val n = nc.values.sum
    val dO = o.collect { case ((a, b), v) if a != b => v }.sum / n
    val dE = (for (a <- cats; b <- cats if a != b) yield nc(a) * nc(b)).sum /
      (n * (n - 1))
    1 - dO / dE
  }

  test("krippendorff: incomplete 4-rater table matches the coincidence-" +
       "matrix reference formulation") {
    val table = Seq(
      // (unit, rater, value) — '.' cells omitted
      (1, "A", 1), (1, "B", 1), (1, "D", 1),
      (2, "A", 2), (2, "B", 2), (2, "D", 2),
      (3, "A", 3), (3, "B", 3), (3, "C", 3), (3, "D", 3),
      (4, "A", 3), (4, "B", 3), (4, "C", 3), (4, "D", 3),
      (5, "A", 2), (5, "B", 2), (5, "C", 2), (5, "D", 2),
      (6, "A", 1), (6, "B", 2), (6, "C", 3), (6, "D", 4),
      (7, "A", 4), (7, "B", 4), (7, "C", 4), (7, "D", 4),
      (8, "A", 1), (8, "B", 1), (8, "C", 2), (8, "D", 1),
      (9, "A", 2), (9, "B", 2), (9, "C", 2), (9, "D", 2),
      (10, "B", 5), (10, "C", 5), (10, "D", 5),
      (11, "B", 1), (11, "C", 1), (11, "D", 1),
      (12, "C", 3), (12, "D", 3))
    val r = Agreement.krippendorffAlpha(table.toDF("item", "rater", "label"),
      "item", "rater", "label").head()
    assert(r.getAs[Long]("n_units") == 12L)
    assert(math.abs(r.getAs[Double]("alpha") - alphaRef(table)) < 1e-12,
      s"alpha=${r.getAs[Double]("alpha")} ref=${alphaRef(table)}")
  }

  test("krippendorff: perfect agreement gives 1; single-rating units drop") {
    val df = Seq(("u1", 0, "a"), ("u1", 1, "a"), ("u2", 0, "b"), ("u2", 1, "b"),
      ("u3", 0, "c")) // u3 has one rating -> excluded
      .toDF("item", "rater", "label")
    val r = Agreement.krippendorffAlpha(df, "item", "rater", "label").head()
    assert(r.getAs[Long]("n_units") == 2L && r.getAs[Long]("n_ratings") == 4L)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("krippendorff: lcm scale covers mixed rater counts exactly") {
    // m in {2, 3, 4} -> scale = lcm(1, 2, 3) = 6; alpha must equal the
    // rational hand computation
    val df = Seq(
      ("u1", 0, "a"), ("u1", 1, "a"),
      ("u2", 0, "a"), ("u2", 1, "b"), ("u2", 2, "a"),
      ("u3", 0, "b"), ("u3", 1, "b"), ("u3", 2, "b"), ("u3", 3, "a"))
      .toDF("item", "rater", "label")
    val r = Agreement.krippendorffAlpha(df, "item", "rater", "label").head()
    assert(r.getAs[Long]("scale") == 6L)
    // coincidence by hand: D_o numerator (scaled): u1: 0; u2: 6/2·(9−5)=12;
    // u3: 6/3·(16−10)=12 -> D'=24. n'_a = 6·4, n'_b = 6·5, n' = 54.
    // alpha = 1 − (54−6)·24 / (54² − (24²+30²)) = 1 − 1152/1440 = 0.2
    assert(math.abs(r.getAs[Double]("alpha") - 0.2) < 1e-12)
  }

  test("krippendorff: one-category degenerate gives NULL alpha, empty is loud") {
    val df = Seq(("u", 0, "a"), ("u", 1, "a")).toDF("item", "rater", "label")
    assert(Agreement.krippendorffAlpha(df, "item", "rater", "label")
      .head().isNullAt(5))
    val singles = Seq(("u", 0, "a"), ("v", 0, "b")).toDF("item", "rater", "label")
    intercept[IllegalArgumentException] {
      Agreement.krippendorffAlpha(singles, "item", "rater", "label")
    }
  }
}
