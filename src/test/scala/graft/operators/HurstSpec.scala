package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for R/S analysis: the two planted regimes the
  * estimator exists to separate (iid noise ≈ ½ vs an integrated walk
  * near 1), exact partition invariance, and the loud refusals. */
class HurstSpec extends AnyFunSuite with SparkSuite {

  private def series(vals: Seq[Long]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
  }

  test("iid noise reads H near 1/2; an integrated walk reads H near 1") {
    val rnd = new scala.util.Random(17)
    val noise = Seq.fill(512)(rnd.nextInt(1000).toLong)
    val hNoise = Hurst.hurstRs(series(noise), "t", "v")
      .head().getAs[Double]("hurst")
    assert(hNoise > 0.35 && hNoise < 0.72, s"hNoise=$hNoise")
    val walk = noise.scanLeft(0L)((acc, x) => acc + x - 500).tail
    val hWalk = Hurst.hurstRs(series(walk), "t", "v")
      .head().getAs[Double]("hurst")
    assert(hWalk > 0.8, s"hWalk=$hWalk")
    assert(hWalk > hNoise + 0.2, "the estimator must separate the regimes")
  }

  test("scale grid: powers of two with k*4 <= n, all rows carry the fit") {
    val rnd = new scala.util.Random(23)
    val out = Hurst.hurstRs(
      series(Seq.fill(256)(rnd.nextInt(100).toLong)).repartition(7),
      "t", "v").collect()
    assert(out.map(_.getAs[Long]("k")).toSeq == Seq(8L, 16L, 32L, 64L))
    assert(out.map(_.getAs[Long]("blocks")).toSeq ==
      Seq(32L, 16L, 8L, 4L))
    assert(out.map(_.getAs[Double]("hurst")).distinct.length == 1)
  }

  test("partition-invariant (exact integer windows + decimal folds)") {
    val rnd = new scala.util.Random(29)
    val vals = Seq.fill(300)(rnd.nextInt(50).toLong)
    val a = Hurst.hurstRs(series(vals), "t", "v").collect()
    val b = Hurst.hurstRs(series(vals).repartition(13), "t", "v").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("float-cancelled variance on a NON-constant block refuses loudly") {
    // offset 3e9: E[x²]−μ² in doubles loses the genuine 0.25 variance
    // entirely (computes exactly 0.0 — verified bit-for-bit) — pre-r17
    // such blocks silently dropped and biased the per-scale R/S mean;
    // now a non-constant block with cancelled variance refuses
    val base = 3000000000L
    val vals = (0 until 128).map(i => base + (i % 2).toLong)
    val ex = intercept[IllegalArgumentException] {
      Hurst.hurstRs(series(vals), "t", "v")
    }
    assert(ex.getMessage.contains("cancelled"), ex.getMessage)
  }

  test("refuses short grids and constant series") {
    assert(intercept[IllegalArgumentException] {
      Hurst.hurstRs(series(Seq.fill(20)(1L)), "t", "v")
    }.getMessage.contains("outside"))
    assert(intercept[IllegalArgumentException] {
      Hurst.hurstRs(series(Seq.fill(128)(7L)), "t", "v")
    }.getMessage.contains("scales"))
  }
}
