package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class WeightingSpec extends AnyFunSuite with SparkSuite {

  test("hand-computed ESS: equal weights are worth their count") {
    import spark.implicits._
    val df = Seq(("a", 7L), ("a", 7L), ("a", 7L), ("a", 7L)).toDF("g", "w")
    val r = Weighting.kishEss(df, "g", "w").head()
    assert(r.getLong(1) == 4 && r.getDouble(3) == 4.0 &&
      r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("hand-computed ESS: a heavy weight collapses the effective size") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L)).toDF("g", "w")
    val r = Weighting.kishEss(df, "g", "w").head()
    // sw=4, sww=10: ess = 16/10 = 1.6, ratio 0.8, deff 1.25
    assert(r.getDouble(3) == 1.6 && r.getDouble(4) == 0.8 &&
      r.getDouble(5) == 1.25)
  }

  test("zero and NULL weights are excluded, groups independent") {
    import spark.implicits._
    val df = Seq(("a", Some(5L)), ("a", Some(0L)), ("a", None),
      ("b", Some(2L)), ("b", Some(2L))).toDF("g", "w")
    val out = Weighting.kishEss(df, "g", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 1L && out("b") == 2L)
  }
}
