package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import java.sql.Timestamp

class FunnelSpec extends AnyFunSuite with SparkSuite {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def run(rows: Seq[(Long, String, Timestamp)]) = {
    import spark.implicits._
    Funnel.conversion(rows.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map { r =>
        def d(i: Int): Double =
          if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
        r.getInt(0) -> ((r.getString(1), r.getLong(2), d(3), d(4)))
      }.toMap
  }

  test("strict ordering: steps only count after the previous step's first hit") {
    val rows = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // purchase BEFORE any click → step 3 not reached
      (2L, "view", ts(5)), (2L, "purchase", ts(4)),
      // click with no view at all → user never enters the funnel
      (3L, "click", ts(1)))
    val m = run(rows)
    assert(m(1) == (("view", 2L, 1.0, 1.0)))
    assert(m(2) == (("click", 1L, 0.5, 0.5)))
    assert(m(3) == (("purchase", 1L, 1.0, 0.5)))
  }

  test("events before the first-step anchor are ignored, later re-hits count") {
    // click@1 precedes view@2 so t2 anchors to click@3, purchase@4 converts
    val rows = Seq((4L, "click", ts(1)), (4L, "view", ts(2)),
      (4L, "click", ts(3)), (4L, "purchase", ts(4)))
    val m = run(rows)
    assert(m(1)._2 == 1L && m(2)._2 == 1L && m(3)._2 == 1L)
  }

  test("simultaneous timestamps do NOT convert (strictly-after semantics)") {
    val rows = Seq((5L, "view", ts(1)), (5L, "click", ts(1)))
    val m = run(rows)
    assert(m(1)._2 == 1L && m(2)._2 == 0L)
  }

  test("duplicate steps and oversize funnels fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    assert(intercept[IllegalArgumentException] {
      Funnel.conversion(df, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      Funnel.conversion(df, "user_id", "event_type", "ts",
        (1 to 17).map(i => s"s$i"))
    }.getMessage.contains("steps"))
  }
}
