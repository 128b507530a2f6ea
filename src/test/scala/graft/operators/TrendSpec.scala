package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class TrendSpec extends AnyFunSuite with SparkSuite {

  private def fit(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    Trend.fit(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          Option(r.get(3)).map(_ => r.getDouble(3)))).toMap
  }

  test("exact line is recovered exactly (integer sums, no noise)") {
    // y = 3x + 7 on x = 0..9
    val rows = (0L to 9L).map(x => ("g", x, 3 * x + 7))
    val got = fit(rows)("g")
    assert(got._1 == 10L && got._2.contains(3.0) && got._3.contains(7.0))
  }

  test("hand-computed least squares on non-collinear points") {
    // points (0,0), (1,2), (2,2): slope = (3·6−3·4)/(3·5−9) = 6/6 = 1
    // intercept = (4 − 1·3)/3 = 1/3
    val got = fit(Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 2L)))("g")
    assert(got._2.contains(1.0))
    assert(got._3.contains(1.0 / 3.0))
  }

  test("vertical data (single x value) yields NULL slope, not an error") {
    val got = fit(Seq(("g", 5L, 1L), ("g", 5L, 9L), ("g", 5L, 4L)))("g")
    assert(got._2.isEmpty && got._3.isEmpty)
  }

  test("groups fit independently") {
    val rows = (0L to 4L).map(x => ("up", x, 2 * x)) ++
      (0L to 4L).map(x => ("down", x, 100 - 2 * x))
    val got = fit(rows)
    assert(got("up")._2.contains(2.0))
    assert(got("down")._2.contains(-2.0))
  }

  test("partitioning-invariant (exact integer sufficient statistics)") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (s"g${i % 3}", i % 37, (i * 13) % 101))
    val a = Trend.fit(rows.toDF("g", "x", "y").coalesce(1), "g", "x", "y")
      .orderBy("g").collect().toSeq
    val b = Trend.fit(rows.toDF("g", "x", "y").repartition(11), "g", "x", "y")
      .orderBy("g").collect().toSeq
    assert(a == b)
  }
}
