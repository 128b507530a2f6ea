package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import java.sql.Timestamp

class CohortsSpec extends AnyFunSuite with SparkSuite {

  private def ts(day: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("hand-computed triangular retention matrix") {
    import spark.implicits._
    // origin 2024-01-01: days 1-7 = week 0, 8-14 = week 1
    val rows = Seq(
      (1L, ts(2)), (1L, ts(9)),   // u1: cohort 0, active weeks 0,1
      (2L, ts(3)),                // u2: cohort 0, week 0 only
      (3L, ts(10)))               // u3: cohort 1
    val out = Cohorts.retention(rows.toDF("user_id", "ts"),
      "user_id", "ts", "2024-01-01")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(out((0L, 1L)) == ((2L, 1L, 0.5)))
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(out.size == 3)
  }

  test("multiple events in one week dedupe to one active mark") {
    import spark.implicits._
    val rows = Seq((1L, ts(2)), (1L, ts(3)), (1L, ts(4)))
    val out = Cohorts.retention(rows.toDF("user_id", "ts"),
      "user_id", "ts", "2024-01-01").collect()
    assert(out.length == 1 && out(0).getLong(3) == 1L)
  }

  test("events before the origin are dropped, not negative-bucketed") {
    import spark.implicits._
    val rows = Seq((1L, ts(2)), (2L, ts(5)))
    val out = Cohorts.retention(rows.toDF("user_id", "ts"),
      "user_id", "ts", "2024-02-01").collect()
    assert(out.isEmpty)
  }
}
