package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ShrinkageSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def seg(name: String, n: Int, x: Int) =
    (1 to n).map(i => (name, i <= x))

  test("ebRates: every shrunk rate sits strictly between raw and prior; " +
    "evidence controls the pull") {
    // same raw rate 0.8 at n = 5 vs n = 500: the tiny one must move more
    val df = (seg("tiny_hi", 5, 4) ++ seg("big_hi", 500, 400) ++
      seg("mid_lo", 100, 30) ++ seg("mid", 100, 55)).toDF("s", "y")
    val out = Shrinkage.ebRates(df, "s", "y").collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    val pm = out("mid").getAs[Double]("prior_mean")
    out.values.foreach { r =>
      val raw = r.getAs[Double]("rate"); val sh = r.getAs[Double]("shrunk")
      if (raw > pm) assert(sh < raw && sh > pm,
        s"${r.getAs[String]("segment")}: $sh not in ($pm, $raw)")
      if (raw < pm) assert(sh > raw && sh < pm)
    }
    assert(math.abs(out("tiny_hi").getAs[Double]("delta")) >
      math.abs(out("big_hi").getAs[Double]("delta")))
    assert(out("mid").getAs[Double]("alpha") > 0 &&
      out("mid").getAs[Double]("beta") > 0)
  }

  test("ebRates refuses zero spread and beta-impossible overdispersion") {
    val flat = (seg("a", 10, 5) ++ seg("b", 20, 10) ++ seg("c", 40, 20))
      .toDF("s", "y")
    val e1 = intercept[IllegalArgumentException](
      Shrinkage.ebRates(flat, "s", "y"))
    assert(e1.getMessage.contains("no"))
    val extreme = (seg("a", 10, 0) ++ seg("b", 10, 10) ++
      seg("c", 10, 0) ++ seg("d", 10, 10)).toDF("s", "y")
    val e2 = intercept[IllegalArgumentException](
      Shrinkage.ebRates(extreme, "s", "y"))
    assert(e2.getMessage.contains("overdispersed"))
  }

  test("ebRates: partitioning-invariant; needs >= 3 segments") {
    val df = (seg("a", 30, 10) ++ seg("b", 50, 30) ++ seg("c", 80, 35) ++
      seg("d", 20, 9)).toDF("s", "y")
    val a = Shrinkage.ebRates(df.coalesce(1), "s", "y")
      .collect().map(_.toString).toSeq
    val b = Shrinkage.ebRates(df.repartition(7), "s", "y")
      .collect().map(_.toString).toSeq
    assert(a == b)
    intercept[IllegalArgumentException](Shrinkage.ebRates(
      (seg("a", 5, 2) ++ seg("b", 5, 3)).toDF("s", "y"), "s", "y"))
  }
}
