package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[Dedup.lshCaptureAudit]] — the S-curve fold: binning boundaries,
  * the (b, r) capture probability, expected-caught mass, and
  * empty-bin omission, against driver closed forms. */
class LshCaptureAuditSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def sCurve(s: Double, r: Double, b: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  test("bins, capture probs, and expected mass match closed form") {
    val pairs = Seq(0.05, 0.07, 0.52, 0.52, 0.87, 1.0, 1.0, 1.0)
      .zipWithIndex.map { case (j, i) => (i.toLong, i.toLong + 100, j) }
      .toDF("a_id", "b_id", "jaccard")
    val out = Dedup.lshCaptureAudit(pairs, bands = 8, rowsPerBand = 3)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    // 0.05/0.07 → bin 1; 0.52 ×2 → bin 10; 0.87 → bin 17; 1.0 ×3 → bin 19
    assert(out.keySet == Set(1L, 10L, 17L, 19L))
    assert(out(10L).getAs[Long]("n_pairs") == 2L)
    assert(out(19L).getAs[Long]("n_pairs") == 3L) // jaccard=1.0 clamps to 19
    val p10 = sCurve(10.5 / 20.0, 3.0, 8.0)
    assert(out(10L).getAs[Double]("capture_prob") ==
      math.rint(p10 * 1e6) / 1e6)
    assert(out(10L).getAs[Double]("expected_caught") ==
      math.rint(2.0 * p10 * 1e6) / 1e6)
    assert(out(10L).getAs[Double]("s_lo") == 0.5)
    // monotone: capture at bin 19 ≈ 1, far above bin 1
    assert(out(19L).getAs[Double]("capture_prob") > 0.999999)
    assert(out(1L).getAs[Double]("capture_prob") < 0.01)
  }

  test("end to end on the corpus: expected_caught <= n_pairs per bin") {
    val pairs = Dedup.ngramJaccardPairs(
      graft.Tables.t(spark, sf, "documents"), "doc_id", "text",
      n = 3, threshold = 0.05, hashShingles = true)
    val out = Dedup.lshCaptureAudit(pairs, bands = 8, rowsPerBand = 3)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("expected_caught") <=
        r.getAs[Long]("n_pairs").toDouble + 1e-9)
      val p = r.getAs[Double]("capture_prob")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
