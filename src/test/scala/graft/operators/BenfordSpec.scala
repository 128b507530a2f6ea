package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the Benford audit: integer digit extraction
  * (micro-unit boundaries, negatives, exclusions), the χ² hand
  * computation, and discrimination (a Benford-ish multiplicative feed
  * vs a uniform fabricated one). */
class BenfordSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("first digits come from exact micro-units: boundaries, negatives, exclusions") {
    val vals = Seq(
      ("a", 0.000001), // 1 micro-unit -> d=1
      ("a", 0.0000004), // rounds below 1 micro-unit -> excluded
      ("a", -92.7), // abs -> d=9
      ("a", 327.53), // d=3
      ("a", 0.08), // d=8
      ("a", 1e6)) // d=1
    val out = Benford.firstDigitAudit(vals.toDF("src", "v"), "src", "v")
      .collect()
    assert(out.head.getAs[Long]("n") == 5) // one excluded
    val byD = out.map(r => r.getAs[Int]("d") -> r.getAs[Long]("o")).toMap
    assert(byD(1) == 2 && byD(3) == 1 && byD(8) == 1 && byD(9) == 1)
    assert(byD(2) == 0 && byD(7) == 0)
  }

  test("chi2 matches the digit-ordered hand fold") {
    val vals = Seq.fill(30)(("s", 1.5)) ++ Seq.fill(20)(("s", 2.5))
    val r = Benford.firstDigitAudit(vals.toDF("src", "v"), "src", "v")
      .collect()
    val n = 50.0
    val chi = (1 to 9).map { d =>
      val o = if (d == 1) 30.0 else if (d == 2) 20.0 else 0.0
      val e = n * Benford.P(d - 1)
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(r.head.getAs[Double]("chi2") -
      BigDecimal(chi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("a multiplicative feed scores far below a uniform fabricated one") {
    // powers of 1.1 are classically Benford; uniform[100, 999] is flat
    val benfordish = (0 until 500).map(i => ("real", math.pow(1.1, i / 4.0)))
    val uniform = (0 until 500).map(i => ("fake", 100.0 + (i * 899.0) / 499.0))
    val out = Benford.firstDigitAudit((benfordish ++ uniform).toDF("src", "v"),
      "src", "v").collect()
    val chi = out.map(r => r.getAs[String]("src") -> r.getAs[Double]("chi2")).toMap
    assert(chi("real") < 20 && chi("fake") > 100,
      s"real=${chi("real")} fake=${chi("fake")}")
  }
}
