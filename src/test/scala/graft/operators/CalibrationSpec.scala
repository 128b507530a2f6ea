package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class CalibrationSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed reliability table and ECE") {
    // bin 9: (0.95, T), (0.95, F) -> conf 0.95, acc 0.5, gap 0.45
    // bin 2: (0.25, F)            -> conf 0.25, acc 0.0, gap 0.25
    // ece = (2*0.45 + 1*0.25) / 3
    val df = Seq((0.95, true), (0.95, false), (0.25, false)).toDF("score", "y")
    val rows = Calibration.ece(df, "score", "y")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5), r.getDouble(7))))
      .toMap
    val (n9, p9, c9, a9, e9) = rows(9)
    assert(n9 == 2L && p9 == 1L && c9 == 0.95 && a9 == 0.5)
    val (n2, p2, c2, a2, _) = rows(2)
    assert(n2 == 1L && p2 == 0L && c2 == 0.25 && a2 == 0.0)
    assert(math.abs(e9 - (2 * 0.45 + 0.25) / 3.0) < 1e-12)
  }

  test("perfectly calibrated degenerate scores give ECE 0") {
    // all score 1.0 & true, all score 0.0 & false: conf == acc in each bin
    val df = (1 to 10).map(_ => (1.0, true)).++((1 to 10).map(_ => (0.0, false)))
      .toDF("score", "y")
    val e = Calibration.ece(df, "score", "y").head().getDouble(7)
    assert(e == 0.0)
  }

  test("score 1.0 lands in the top bin (no bins overflow)") {
    val df = Seq((1.0, true)).toDF("score", "y")
    assert(Calibration.ece(df, "score", "y").head().getInt(0) == 9)
  }

  test("ece invariant to partitioning (integer ppm accumulation)") {
    val rows = (1 to 500).map(i => (i / 500.0, i % 3 == 0))
    val df = rows.toDF("score", "y")
    val a = Calibration.ece(df, "score", "y").collect().map(_.toSeq).toSeq
    val b = Calibration.ece(df.repartition(17), "score", "y").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("conformal threshold: hand-computed rank and coverage") {
    // n=19 scores 1..19, alpha=1/10: q_rank = ceil(0.9*20) = 18 -> qhat=18
    val df = (1 to 19).map(i => ("g", i)).toDF("g", "s")
    val r = Calibration.conformalThreshold(df, "g", "s", 1, 10).head()
    assert(r.getLong(1) == 19L && r.getLong(2) == 18L && r.getLong(3) == 18L)
    assert(r.getLong(4) == 18L) // scores <= 18
  }

  test("small group saturates at the max score, reported honestly") {
    // n=5 < 1/alpha - 1 would need rank ceil(0.9*6)=6 > n -> clamp to 5
    val df = (1 to 5).map(i => ("g", i * 10)).toDF("g", "s")
    val r = Calibration.conformalThreshold(df, "g", "s", 1, 10).head()
    assert(r.getLong(2) == 5L && r.getLong(3) == 50L && r.getLong(4) == 5L)
  }

  test("coverage always reaches the rank: n_covered >= q_rank per group") {
    val df = (1 to 200).map(i => (s"g${i % 7}", (i * 37) % 101)).toDF("g", "s")
    val rows = Calibration.conformalThreshold(df, "g", "s", 1, 10).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(4) >= r.getLong(2)))
  }

  test("bad alpha fails loudly") {
    val df = Seq(("g", 1)).toDF("g", "s")
    intercept[IllegalArgumentException] {
      Calibration.conformalThreshold(df, "g", "s", 10, 10)
    }
  }

  test("fractional score columns fail loudly (integer-domain contract)") {
    // a silent long cast would truncate every score in (0,1) to 0
    val df = Seq(("g", 0.93), ("g", 0.07)).toDF("g", "s")
    val e = intercept[IllegalArgumentException] {
      Calibration.conformalThreshold(df, "g", "s", 1, 10)
    }
    assert(e.getMessage.contains("integral"))
    // the documented remedy works: scale to a fixed grid first
    val scaled = df.selectExpr("g", "CAST(floor(s * 1000000) AS BIGINT) AS s")
    val r = Calibration.conformalThreshold(scaled, "g", "s", 1, 10).head()
    assert(r.getLong(1) == 2L)
  }

  test("brier decomposition hand-computed; Murphy identity holds with bin-mean conf") {
    import spark.implicits._
    val df = Seq((0.1, false), (0.1, true), (0.9, true), (0.9, true))
      .toDF("s", "y")
    val r = Calibration.brierDecomposition(df, "s", "y", bins = 2)
      .orderBy("bin").collect()
    assert(r.length == 2)
    val b0 = r(0); val b1 = r(1)
    assert(b0.getLong(1) == 2 && b0.getDouble(3) == 0.1 &&
      b0.getDouble(4) == 0.5)
    assert(b1.getDouble(3) == 0.9 && b1.getDouble(4) == 1.0)
    val (brier, rel, res, unc) = (b0.getDouble(5), b0.getDouble(6),
      b0.getDouble(7), b0.getDouble(8))
    assert(math.abs(brier - 0.21) < 1e-6)
    assert(math.abs(rel - 0.085) < 1e-6)
    assert(math.abs(res - 0.0625) < 1e-6)
    assert(math.abs(unc - 0.1875) < 1e-6)
    // Murphy identity is exact when conf is the bin mean
    assert(math.abs(brier - (rel - res + unc)) < 1e-5)
  }

  test("brier decomposition: a base-rate predictor has zero resolution") {
    import spark.implicits._
    // always predicts 0.5 on a 50/50 corpus: calibrated, useless
    val df = (1 to 40).map(i => (0.5, i % 2 == 0)).toDF("s", "y")
    val r = Calibration.brierDecomposition(df, "s", "y", bins = 10).head()
    assert(r.getDouble(7) == 0.0, "resolution")
    assert(r.getDouble(6) == 0.0, "reliability")
    assert(math.abs(r.getDouble(5) - 0.25) < 1e-6, "brier = uncertainty")
  }
}
