package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ProfilerSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.5), "aa"),
    (2L, Some(-3.0), "bbb"),
    (3L, None, "aa"),
    (4L, Some(10.5), null)
  ).toDF("id", "score", "tag")

  test("counts, nulls, distincts per column") {
    val p = Profiler.profile(df, Seq("id", "score", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((4L, 4L, 4L)))
    assert(p("score") == ((4L, 3L, 2L))) // 10.5 appears twice
    assert(p("tag") == ((4L, 3L, 2L)))   // "aa" appears twice
  }

  test("numeric ranges are value min/max; string ranges are length min/max") {
    val p = Profiler.profile(df, Seq("score", "tag"))
      .collect().map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    assert(p("score") == ((-3.0, 10.5)))
    assert(p("tag") == ((2.0, 3.0)))
  }

  test("unsupported types profile counts but null ranges") {
    val arr = Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("id", "xs")
    val row = Profiler.profile(arr, Seq("xs")).head()
    assert(row.getLong(1) == 2 && row.getLong(3) == 2)
    assert(row.isNullAt(4) && row.isNullAt(5))
  }

  test("all-null column: zero nonnull/distinct, null ranges") {
    val d = Seq((1L, Option.empty[java.lang.Double])).toDF("id", "v")
    val row = Profiler.profile(d, Seq("v")).head()
    assert(row.getLong(2) == 0 && row.getLong(3) == 0)
    assert(row.isNullAt(4) && row.isNullAt(5))
  }

  test("single scan, single shuffle for the distinct stats (no Expand blowup)") {
    val plan = Profiler.profile(df, Seq("id", "score", "tag"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"), s"multi-distinct Expand in plan:\n$plan")
  }
}
