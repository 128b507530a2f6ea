package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DispersionSpec extends AnyFunSuite with SparkSuite {

  test("hand-computed Fano with a silent period counted as zero") {
    import spark.implicits._
    // group g: 3 events at h=1, none at h=2, 3 at h=3; group z pins h=2
    val rows = Seq.fill(3)(("g", 1L)) ++ Seq.fill(3)(("g", 3L)) ++
      Seq(("z", 2L))
    val out = Dispersion.fano(rows.toDF("g", "h"), "g", "h")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // g over the dense grid {1,2,3}: counts 3,0,3 -> mean 2,
    // var = (3*18-36)/(3*2) = 3, fano = 1.5
    assert(out("g") == ((3L, 6L, 2.0, 1.5)))
    // z: counts 0,1,0 -> mean 1/3, var = (3*1-1)/6 = 1/3, fano = 1
    assert(out("z")._4 == 1.0)
  }

  test("a metronomic feed has Fano 0; missing the dense fill would hide burst") {
    import spark.implicits._
    val steady = (1L to 10L).map(h => ("s", h))
    val bursty = Seq.fill(10)(("b", 5L))
    val out = Dispersion.fano((steady ++ bursty).toDF("g", "h"), "g", "h")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("s") == 0.0)
    assert(out("b") == 10.0, "burst concentrated in one of 10 periods")
  }

  test("zeroInflation hand-computed against the Poisson null") {
    import spark.implicits._
    // g: 1 event at h=1, 1 at h=2, silent at h=3 (pinned by z)
    val rows = Seq(("g", 1L), ("g", 2L), ("z", 3L)).toDF("g", "h")
    val out = Dispersion.zeroInflation(rows.toDF("g", "h"), "g", "h")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(7)))
      .toMap
    val (zeros, lam, p0, excess) = out("g")
    assert(zeros == 1L)
    assert(math.abs(lam - 2.0 / 3.0) < 1e-6)
    assert(math.abs(p0 - 1.0 / 3.0) < 1e-6)
    assert(math.abs(excess - (1.0 / 3.0 - math.exp(-2.0 / 3.0))) < 1e-5)
  }

  test("negBinFit hand-computed on {0,0,3,5}: r and p from moments") {
    import spark.implicits._
    // m = 2, s2 = (0+0+9+25 − 16)/3 = 6; r = 4/(6−2) = 1, p = 2/6
    val r = Dispersion.negBinFit(Seq(0L, 0L, 3L, 5L).toDF("x")
      .repartition(3), "x").head()
    assert(r.getAs[Double]("mean") == 2.0)
    assert(r.getAs[Double]("variance") == 6.0)
    assert(r.getAs[Double]("r_hat") == 1.0)
    assert(math.abs(r.getAs[Double]("p_hat") - 1.0 / 3.0) < 1e-6)
  }

  test("negBinFit: a planted gamma-mixture recovers small r; refusals") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    // two user classes with 5x different rates → strong overdispersion
    val counts = (1 to 600).map { i =>
      val rate = if (i % 2 == 0) 2 else 10
      (0 until rate).count(_ => rnd.nextDouble() < 0.9).toLong
    }
    val r = Dispersion.negBinFit(counts.toDF("x"), "x").head()
    assert(r.getAs[Double]("dispersion") > 2.0)
    assert(r.getAs[Double]("r_hat") < 10.0)
    // equidispersed/underdispersed refuses
    assert(intercept[IllegalArgumentException] {
      Dispersion.negBinFit(Seq.fill(50)(4L).toDF("x"), "x")
    }.getMessage.contains("overdispersed"))
    assert(intercept[IllegalArgumentException] {
      Dispersion.negBinFit(Seq(1.5, 2.5).toDF("x"), "x")
    }.getMessage.contains("integers"))
  }
  test("griesDp: a one-part word reads DP = 1 - its part share; an " +
      "everywhere-proportional word reads DP = 0") {
    import spark.implicits._
    // two equal-size parts (10 tokens each): "even" appears 2+2,
    // "clump" appears 4 times only in part A
    val df = Seq(
      ("A", "even even clump clump clump clump x x x x"),
      ("B", "even even y y y y y y y y")).toDF("src", "text")
    val out = Dispersion.griesDp(df, "src", "text", k = 10).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Double]("dp")).toMap
    assert(out("even") == 0.0)
    // clump: |4/4 - 1/2|/2 + |0 - 1/2|/2 = 1/2
    assert(out("clump") == 0.5)
    // the clumped word must rank above the even one
    val ranked = Dispersion.griesDp(df, "src", "text", k = 10).collect()
    assert(ranked.head.getAs[Double]("dp") >= ranked.last.getAs[Double]("dp"))
  }

  test("griesDp: zero-filled grid (absence from a part is counted) and " +
      "partition invariance") {
    import spark.implicits._
    val df = Seq(("A", "only here words words"), ("B", "other stuff words"),
      ("C", "third part words")).toDF("src", "text")
    val out = Dispersion.griesDp(df, "src", "text", k = 5).collect()
    val only = out.find(_.getAs[String]("word") == "only")
    assert(only.nonEmpty && only.get.getAs[Double]("dp") > 0.5,
      "a single-part word must read high DP against two absent parts")
    val a = Dispersion.griesDp(df, "src", "text", k = 5)
      .collect().map(_.toString).toSeq
    val b = Dispersion.griesDp(df.repartition(5), "src", "text", k = 5)
      .collect().map(_.toString).toSeq
    assert(a == b)
    assert(intercept[IllegalArgumentException] {
      Dispersion.griesDp(Seq.empty[(String, String)].toDF("src", "text"),
        "src", "text")
    }.getMessage.contains("tokens"))
  }
}
