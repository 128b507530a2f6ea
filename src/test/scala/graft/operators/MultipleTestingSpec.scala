package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class MultipleTestingSpec extends AnyFunSuite with SparkSuite {

  test("pinned normal CDF matches reference values within the A&S bound") {
    import spark.implicits._
    val zs = Seq(-3.0, -1.96, -1.0, 0.0, 0.5, 1.0, 1.96, 3.0)
    val got = zs.toDF("z")
      .select(MultipleTesting.normalCdf(col("z")).as("phi"))
      .collect().map(_.getDouble(0))
    val ref = Seq(0.0013499, 0.0249979, 0.1586553, 0.5, 0.6914625,
      0.8413447, 0.9750021, 0.9986501)
    got.zip(ref).foreach { case (g, r) =>
      assert(math.abs(g - r) < 1e-6, s"got $g want $r")
    }
  }

  test("BH step-up rejects THROUGH a locally-failing rank") {
    import spark.implicits._
    // z chosen for p ~ {.001, .030, .035, .900}: with m=4, alpha=.05 the
    // thresholds are {.0125, .025, .0375, .05} — rank 2 fails its own
    // threshold but rank 3 passes, so the step-up rejects ranks 1..3
    val tests = Seq(("s1", 3.2905), ("s2", 2.1701), ("s3", 2.1080),
      ("s4", 0.1257)).toDF("seg", "z")
    val out = MultipleTesting.bhAdjust(tests, "seg", "z", alpha = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getBoolean(6))).toMap
    assert(out("s1") == ((1L, true)))
    assert(out("s2") == ((2L, true)), "step-up must reach back past rank 2")
    assert(out("s3") == ((3L, true)))
    assert(out("s4") == ((4L, false)))
  }

  test("nothing significant rejects nothing; NULL z rows are excluded") {
    import spark.implicits._
    val tests = Seq(("a", Some(0.1)), ("b", Some(-0.2)), ("c", None))
      .toDF("seg", "z")
    val out = MultipleTesting.bhAdjust(tests, "seg", "z").collect()
    assert(out.length == 2)
    assert(out.forall(!_.getBoolean(6)))
    assert(out.forall(_.getLong(4) == 2L))
  }

  test("holmAdjust: step-down adjusted p is the running max of " +
    "(m-j+1)*p capped at 1; monotone by construction") {
    import spark.implicits._
    // z chosen to spread p: huge, middling, null effects
    val tests = Seq(("big", 5.0), ("mid", 2.2), ("null1", 0.4),
      ("null2", 0.1)).toDF("seg", "z")
    val out = MultipleTesting.holmAdjust(tests, "seg", "z").collect()
    assert(out.map(_.getAs[String]("seg")).toSeq ==
      Seq("big", "mid", "null1", "null2")) // p-ascending
    val ps = out.map(_.getAs[Double]("p"))
    val m = out.length
    var run = 0.0
    out.zipWithIndex.foreach { case (r, i) =>
      run = math.max(run, (m - i).toDouble * ps(i))
      val want = BigDecimal(math.min(1.0, run))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("p_holm") == want)
    }
    // adjusted p never decreases down the ranks
    val adj = out.map(_.getAs[Double]("p_holm"))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b })
    // the huge effect survives FWER control, the nulls do not
    assert(out.head.getAs[Boolean]("reject"))
    assert(!out.last.getAs[Boolean]("reject"))
  }

  test("holmAdjust rejects a subset of bhAdjust's rejections (FWER is " +
    "stricter than FDR)") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val tests = (1 to 40).map(i =>
      (s"s$i", if (i <= 8) 3.0 + rnd.nextDouble() else rnd.nextGaussian()))
      .toDF("seg", "z")
    val holm = MultipleTesting.holmAdjust(tests, "seg", "z").collect()
      .filter(_.getAs[Boolean]("reject")).map(_.getString(0)).toSet
    val bh = MultipleTesting.bhAdjust(tests, "seg", "z").collect()
      .filter(_.getAs[Boolean]("reject")).map(_.getString(0)).toSet
    assert(holm.subsetOf(bh))
    assert(holm.nonEmpty)
  }
}
