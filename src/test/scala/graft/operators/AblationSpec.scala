package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class AblationSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("filterAblation: hand-computed masks, unique failures, survivors") {
    // (1,x): fails both; (5,x): only f2; (1,y): only f1; (5,y): clean
    val df = Seq((1L, "x"), (5L, "x"), (1L, "y"), (5L, "y")).toDF("v", "s")
    val out = Ablation.filterAblation(df, Seq(
      "f1_small" -> (col("v") < 2),
      "f2_x" -> (col("s") === "x")))
      .collect().map(r => r.getAs[String]("filter") ->
        (r.getAs[Long]("n_failing"), r.getAs[Long]("n_unique_failures"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_survivors"))).toMap
    assert(out("f1_small") == ((2L, 1L, 4L, 1L)))
    assert(out("f2_x") == ((2L, 1L, 4L, 1L)))
  }

  test("filterAblation: NULL predicate results count as failures") {
    val df = Seq(Some(1L), None, Some(5L)).toDF("v")
    val r = Ablation.filterAblation(df, Seq("small" -> (col("v") < 2)))
      .head()
    assert(r.getAs[Long]("n_failing") == 2L) // the 1 AND the NULL
    assert(r.getAs[Long]("n_survivors") == 1L)
  }

  test("filterAblation: a fully-shadowed filter has zero unique failures") {
    val df = Seq(1L, 2L, 3L, 50L).toDF("v")
    val out = Ablation.filterAblation(df, Seq(
      "wide" -> (col("v") < 10),
      "narrow" -> (col("v") < 5))) // every narrow failure also fails wide
      .collect().map(r => r.getAs[String]("filter") ->
        r.getAs[Long]("n_unique_failures")).toMap
    assert(out("narrow") == 0L)
    assert(out("wide") == 0L) // identical sets here: neither is unique
  }

  test("filterAblation: partitioning-invariant; refuses bad batteries") {
    val df = (1 to 500).map(_.toLong).toDF("v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ablation.filterAblation(d, Seq("a" -> (col("v") % 3 === 0),
        "b" -> (col("v") % 5 === 0), "c" -> (col("v") > 400)))
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
    intercept[IllegalArgumentException](
      Ablation.filterAblation(df, Seq.empty))
    intercept[IllegalArgumentException](
      Ablation.filterAblation(df, Seq("a" -> lit(true), "a" -> lit(false))))
    intercept[IllegalArgumentException](
      Ablation.filterAblation(df,
        (1 to 13).map(i => s"f$i" -> (col("v") < i))))
  }
}
