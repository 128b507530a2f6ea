package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the Lo–MacKinlay VR test: the two planted
  * regimes it exists to separate (a random walk reads VR ≈ 1 at every
  * horizon; a trending/momentum series reads VR > 1), partition
  * invariance, and the loud refusals. */
class VarianceRatioSpec extends AnyFunSuite with SparkSuite {

  private def series(vals: Seq[Long]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
  }

  test("random-walk increments read VR near 1; a trend reads VR > 1") {
    val rnd = new scala.util.Random(31)
    val walk = Seq.iterate(0L, 512)(y => y + rnd.nextInt(201) - 100)
    val vrWalk = VarianceRatio.varianceRatio(series(walk), "t", "v")
      .collect().map(r => r.getAs[Long]("q") -> r.getAs[Double]("vr")).toMap
    assert(vrWalk.values.forall(v => v > 0.6 && v < 1.5), vrWalk)
    // momentum: long runs up then down — q-step variance grows superlinearly
    val trend = Seq.tabulate(512)(i =>
      (if ((i / 64) % 2 == 0) i % 64 else 64 - i % 64).toLong * 100 +
        rnd.nextInt(10))
    val vrTrend = VarianceRatio.varianceRatio(series(trend), "t", "v")
      .collect().map(r => r.getAs[Long]("q") -> r.getAs[Double]("vr")).toMap
    assert(vrTrend(8L) > 2.0, vrTrend)
    assert(vrTrend(8L) > vrWalk(8L) + 1.0,
      "the estimator must separate the regimes")
  }

  test("z carries the Lo-MacKinlay asymptotic scaling (larger n, larger |z|)") {
    val trendSmall = Seq.tabulate(128)(i => (i.toLong % 32) * 10)
    val trendBig = Seq.tabulate(512)(i => (i.toLong % 32) * 10)
    val zS = VarianceRatio.varianceRatio(series(trendSmall), "t", "v", Seq(4))
      .head().getAs[Double]("z")
    val zB = VarianceRatio.varianceRatio(series(trendBig), "t", "v", Seq(4))
      .head().getAs[Double]("z")
    assert(math.abs(zB) > math.abs(zS))
  }

  test("partition-invariant (exact decimal folds over lag windows)") {
    val rnd = new scala.util.Random(37)
    val vals = Seq.fill(256)(rnd.nextInt(1000).toLong)
    val a = VarianceRatio.varianceRatio(series(vals), "t", "v").collect()
    val b = VarianceRatio.varianceRatio(series(vals).repartition(11),
      "t", "v").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("refuses short grids, bad horizons, and constant series") {
    assert(intercept[IllegalArgumentException] {
      VarianceRatio.varianceRatio(series(Seq.fill(8)(1L)), "t", "v")
    }.getMessage.contains("outside"))
    assert(intercept[IllegalArgumentException] {
      VarianceRatio.varianceRatio(series(Seq.fill(64)(1L)), "t", "v", Seq(1))
    }.getMessage.contains("horizons"))
    assert(intercept[IllegalArgumentException] {
      VarianceRatio.varianceRatio(series(Seq.fill(64)(7L)), "t", "v")
    }.getMessage.contains("constant"))
    assert(intercept[IllegalArgumentException] {
      VarianceRatio.varianceRatio(series((1L to 20L)), "t", "v", Seq(8))
    }.getMessage.contains("short"))
  }
}
