package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SkylineSpec extends AnyFunSuite with SparkSuite {

  private def df(rows: (Long, Double, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "x", "y")
  }

  private def sky(d: org.apache.spark.sql.DataFrame, cols: String*): Set[Long] =
    Skyline.skyline(d, cols).select("id").collect().map(_.getLong(0)).toSet

  test("strictly dominated rows drop; the frontier stays") {
    val d = df((1L, 1.0, 9.0), (2L, 5.0, 5.0), (3L, 9.0, 1.0),
      (4L, 4.0, 4.0), (5L, 0.5, 0.5))
    assert(sky(d, "x", "y") == Set(1L, 2L, 3L))
  }

  test("exact ties survive together; partial ties dominate") {
    // 1 and 2 are identical → neither dominates; 3 ties x but loses y
    val d = df((1L, 5.0, 5.0), (2L, 5.0, 5.0), (3L, 5.0, 4.0))
    assert(sky(d, "x", "y") == Set(1L, 2L))
  }

  test("single criterion degenerates to argmax (with duplicate maxima kept)") {
    val d = df((1L, 3.0, 0.0), (2L, 7.0, 1.0), (3L, 7.0, 2.0))
    assert(sky(d, "x") == Set(2L, 3L))
  }

  test("null criteria rows are excluded, like the SQL dominance oracle") {
    import spark.implicits._
    val d = Seq((1L, Some(1.0), Some(2.0)), (2L, None, Some(9.0)),
      (3L, Some(2.0), Some(3.0))).toDF("id", "x", "y")
    assert(sky(d, "x", "y") == Set(3L))
  }

  test("partition-invariant: local prune never loses a global survivor") {
    val rows = (1L to 400L).map(i => (i, (i % 20).toDouble, (i % 17).toDouble))
    val d1 = df(rows: _*)
    val d2 = df(rows: _*).repartition(13)
    assert(sky(d1, "x", "y") == sky(d2, "x", "y"))
  }

  test("matches the O(n²) definition on random data, 3 criteria") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    import spark.implicits._
    val d = rows.toDF("id", "x", "y", "z")
    def dom(a: (Long, Double, Double, Double), b: (Long, Double, Double, Double)) =
      a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4 &&
        (a._2 > b._2 || a._3 > b._3 || a._4 > b._4)
    val expect = rows.filter(r => !rows.exists(o => dom(o, r))).map(_._1).toSet
    val got = Skyline.skyline(d, Seq("x", "y", "z")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("cap is order-independent: transient overshoot with a small final frontier passes") {
    // 60 mutually non-dominating rows arrive first (prefix frontier 60),
    // then one row dominates them all — final frontier is 1. A mid-scan
    // cap check would fail here purely because of row order.
    val rows = (1L to 60L).map(i => (i, i.toDouble, (61 - i).toDouble)) :+
      (99L, 100.0, 100.0)
    val d = df(rows: _*).coalesce(1)
    assert(sky(d, "x", "y") == Set(99L))
    val capped = Skyline.skyline(df(rows: _*).coalesce(1), Seq("x", "y"),
      maxLocalFrontier = 5).select("id").collect().map(_.getLong(0)).toSet
    assert(capped == Set(99L))
  }

  test("frontier cap fails loudly on anti-correlated criteria") {
    val rows = (1L to 500L).map(i => (i, i.toDouble, -i.toDouble))
    val d = df(rows: _*).coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      Skyline.skyline(d, Seq("x", "y"), maxLocalFrontier = 100).collect()
    }
    assert(e.getMessage.contains("frontier") || e.getCause != null)
  }
}
