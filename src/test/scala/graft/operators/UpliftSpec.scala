package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class UpliftSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  /** score 2 = persuadables (t: 8/10 conv, c: 2/10); score 1 = inert
    * (t: 3/10, c: 3/10). q(.5) = 6, q(1) = 6, qini = +1.5. */
  private def units(flip: Boolean) = {
    def grp(score: Long, arm: Int, conv: Int, n: Int) =
      (1 to n).map(i => (arm, if (flip) 3 - score else score, i <= conv))
    (grp(2, 1, 8, 10) ++ grp(2, 0, 2, 10) ++
      grp(1, 1, 3, 10) ++ grp(1, 0, 3, 10))
      .toDF("arm", "score", "conv")
      .selectExpr("arm", "CAST(score AS LONG) AS score", "conv")
  }

  test("qini: hand-computed curve and coefficient for a perfect targeter") {
    val out = Uplift.qini(units(flip = false), "arm", "score", "conv")
      .collect()
    assert(out.length == 10)
    val d = out.map(r => r.getAs[Long]("decile") -> r).toMap
    // deciles 1-5 all cut at the tied score-2 block (depth 0.5)
    assert(d(1L).getAs[Long]("score_cut") == 2L)
    assert(d(5L).getAs[Double]("depth") == 0.5)
    assert(d(5L).getAs[Double]("uplift") == 6.0)
    assert(d(5L).getAs[Long]("x_t") == 8L && d(5L).getAs[Long]("x_c") == 2L)
    assert(d(10L).getAs[Double]("depth") == 1.0)
    assert(d(10L).getAs[Double]("uplift") == 6.0)
    // area 4.5 minus the random triangle 3.0
    assert(out.forall(_.getAs[Double]("qini_coef") == 1.5))
  }

  test("qini: inverting the score mirrors the coefficient") {
    val out = Uplift.qini(units(flip = true), "arm", "score", "conv")
      .collect()
    assert(out.forall(_.getAs[Double]("qini_coef") == -1.5))
    // the worst decile now leads: uplift at depth .5 is 0
    val d5 = out.find(_.getAs[Long]("decile") == 5L).get
    assert(d5.getAs[Double]("uplift") == 0.0)
  }

  test("qini: partitioning-invariant; refuses one-arm and double scores") {
    val df = units(flip = false)
    val a = Uplift.qini(df.coalesce(1), "arm", "score", "conv")
      .collect().map(_.toString).toSeq
    val b = Uplift.qini(df.repartition(7), "arm", "score", "conv")
      .collect().map(_.toString).toSeq
    assert(a == b)
    val oneArm = df.filter($"arm" === 1)
    val e = intercept[IllegalArgumentException](
      Uplift.qini(oneArm, "arm", "score", "conv"))
    assert(e.getMessage.contains("both arms"))
    val dbl = df.selectExpr("arm", "CAST(score AS DOUBLE) AS score", "conv")
    intercept[IllegalArgumentException](
      Uplift.qini(dbl, "arm", "score", "conv"))
  }
}
