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

  test("raking: an already-balanced table needs no reweighting") {
    import spark.implicits._
    // 2x2 with every cell = 5: both margins already uniform
    val df = (for (r <- Seq("a", "b"); c <- Seq("x", "y");
                   _ <- 1 to 5) yield (r, c)).toDF("r", "c")
    val out = Weighting.raking(df, "r", "c").collect()
    assert(out.forall(_.getAs[Double]("multiplier") == 1.0))
    assert(out.forall(_.getAs[Double]("max_row_dev") == 0.0))
    assert(out.forall(r => r.getAs[Double]("weighted") ==
      r.getAs[Long]("n").toDouble))
  }

  test("raking: converges both margins to uniform on a skewed table") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(4000)((s"r${rnd.nextInt(4)}", s"c${rnd.nextInt(5)}"))
    val df = rows.toDF("r", "c")
    val out = Weighting.raking(df, "r", "c", iterations = 12).collect()
    val n = out.map(_.getAs[Long]("n")).sum
    val colMass = out.groupBy(_.getAs[String]("c"))
      .map { case (_, cs) => cs.map(_.getAs[Double]("weighted")).sum }
    // the LAST step scales columns: they must sit on target exactly
    colMass.foreach(m => assert(math.abs(m - n / 5.0) < 1e-6))
    val rowMass = out.groupBy(_.getAs[String]("r"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("weighted")).sum }
    rowMass.foreach(m => assert(math.abs(m - n / 4.0) < 1e-3))
    assert(out.head.getAs[Double]("max_row_dev") < 1e-3)
  }

  test("raking: partitioning-invariant; refuses an unbounded grid") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"r${i % 3}", s"c${i % 7}")).toDF("r", "c")
    val a = Weighting.raking(df.coalesce(1), "r", "c")
      .collect().map(_.toString).toSeq
    val b = Weighting.raking(df.repartition(11), "r", "c")
      .collect().map(_.toString).toSeq
    assert(a == b)
    val wide = spark.range(10000).selectExpr("CAST(id AS STRING) AS r",
      "CAST(id % 97 AS STRING) AS c")
    intercept[IllegalArgumentException](Weighting.raking(wide, "r", "c"))
  }
}
