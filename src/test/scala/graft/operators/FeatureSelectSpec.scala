package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for MI feature selection: the hand-computed 2×2
  * MI, the perfectly-predictive and independent extremes, presence
  * (not frequency) semantics, and the df-ranked topN cut. */
class FeatureSelectSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta common", true),
    (2L, "alpha gamma common", true),
    (3L, "delta beta common", false),
    (4L, "delta gamma common", false)).toDF("id", "text", "y")

  test("perfectly predictive terms get MI = H(label); independent get 0") {
    val out = FeatureSelect.mutualInfo(docs, "id", "text", "y")
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Double]("mi")).toMap
    // 'alpha' present iff y: MI = H(y) = ln 2 with balanced labels
    val ln2r = BigDecimal(math.log(2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("alpha") == ln2r && out("delta") == ln2r)
    assert(out("common") == 0.0) // df = N -> no information
    assert(out("beta") == 0.0 && out("gamma") == 0.0) // independent of y
  }

  test("hand 2x2 MI on an informative-but-imperfect term") {
    val d2 = Seq(
      (1L, "x a", true), (2L, "x b", true), (3L, "x c", false),
      (4L, "z d", false), (5L, "z e", false), (6L, "z f", true))
      .toDF("id", "text", "y")
    val out = FeatureSelect.mutualInfo(d2, "id", "text", "y")
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Double]("mi")).toMap
    // term 'x': n11=2, n10=1, n01=1, n00=2, N=6, ny=3
    def cell(nij: Double, ni: Double, nj: Double): Double =
      if (nij > 0) (nij / 6) * math.log(nij * 6 / (ni * nj)) else 0.0
    val mi = cell(2, 3, 3) + cell(1, 3, 3) + cell(1, 3, 3) + cell(2, 3, 3)
    assert(out("x") ==
      BigDecimal(mi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("presence semantics: repeated terms count once per doc") {
    val d3 = Seq((1L, "w w w w", true), (2L, "v", false)).toDF("id", "text", "y")
    val out = FeatureSelect.mutualInfo(d3, "id", "text", "y").collect()
    assert(out.find(_.getString(0) == "w").get.getAs[Long]("df") == 1L)
  }

  test("topN cuts by df with deterministic ties, output ordered by term") {
    val out = FeatureSelect.mutualInfo(docs, "id", "text", "y", topN = 2)
      .collect().map(_.getAs[String]("term")).toSeq
    // df: common=4; alpha/beta/delta/gamma=2 -> 'alpha' wins the tie
    assert(out == Seq("alpha", "common"))
  }
}
