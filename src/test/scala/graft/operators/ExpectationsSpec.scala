package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.operators.Expectations.Rule

class ExpectationsSpec extends AnyFunSuite with SparkSuite {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, 10.0, "view"),
      (2L, -5.0, "view"),     // fails nonneg
      (3L, 10.0, "bogus"),    // fails enum
      (4L, -1.0, "bogus"),    // fails both
      (5L, Double.NaN, "view") // Spark orders NaN ABOVE all doubles, so a
                               // bare `v >= 0` passes it — range contracts
                               // over float columns need an explicit isnan
                               // rule (finite), demonstrated here
    ).toDF("id", "v", "kind")
  }

  private val rules = Seq(
    Rule("nonneg", col("v") >= 0),
    Rule("finite", !isnan(col("v"))),
    Rule("enum", col("kind").isin("view", "click")))

  test("annotate records the sorted names of every failed rule") {
    val out = Expectations.annotate(df, rules)
      .select(col("id"), col("violations")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq())
    assert(out(2L) == Seq("nonneg"))
    assert(out(3L) == Seq("enum"))
    assert(out(4L) == Seq("enum", "nonneg")) // name-sorted
    assert(out(5L) == Seq("finite")) // NaN >= 0 is TRUE under Spark ordering
  }

  test("null rule results quarantine (contracts are total)") {
    import spark.implicits._
    val d = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")
    val out = Expectations.annotate(d, Seq(Rule("nonneg", col("v") >= 0)))
      .filter(size(col("violations")) > 0).select("id").as[Long].collect()
    assert(out.toSeq == Seq(2L))
  }

  test("split partitions the input exactly; clean side drops the audit column") {
    val (pass, quar) = Expectations.split(df, rules)
    assert(pass.count() + quar.count() == df.count())
    assert(!pass.columns.contains("violations"))
    assert(quar.columns.contains("violations"))
    assert(pass.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("audit counts violations per rule") {
    val audit = Expectations.audit(Expectations.annotate(df, rules))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("nonneg" -> 2L, "finite" -> 1L, "enum" -> 2L))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.annotate(df, Seq(Rule("r", lit(true)), Rule("r", lit(false))))
    }
  }

  test("rules stay codegen-friendly: no ScalaUDF in the annotated plan") {
    val plan = Expectations.annotate(df, rules).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }
}
