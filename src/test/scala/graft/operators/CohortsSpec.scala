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

  test("cohortLtv hand-computed across a year boundary") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // u1 first orders Dec-1999 (cohort 199912), returns Feb-2000 (age 2)
    // u2 first orders Feb-2000 (cohort 200002)
    val orders = Seq(
      (1L, ts("1999-12-05"), 1000L), (1L, ts("1999-12-20"), 500L),
      (1L, ts("2000-02-01"), 2000L),
      (2L, ts("2000-02-10"), 700L)).toDF("u", "dt", "cents")
    val rows = Cohorts.cohortLtv(orders, "u", "dt", "cents")
      .collect().map(r => (r.getAs[Long]("cohort_ym"),
        r.getAs[Long]("age_m"), r.getAs[Long]("cohort_customers"),
        r.getAs[Long]("orders_n"), r.getAs[Long]("rev_cents"),
        r.getAs[Long]("cum_rev_cents"), r.getAs[Double]("ltv_cents")))
    assert(rows.toSeq == Seq(
      (199912L, 0L, 1L, 2L, 1500L, 1500L, 1500.0),
      (199912L, 2L, 1L, 1L, 2000L, 3500L, 3500.0),
      (200002L, 0L, 1L, 1L, 700L, 700L, 700.0)))
  }

  test("cohortLtv divides by cohort size and is partition-invariant") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // two customers in the same cohort, one returns
    val orders = Seq(
      (1L, ts("2020-03-01"), 100L), (2L, ts("2020-03-15"), 300L),
      (1L, ts("2020-04-02"), 600L)).toDF("u", "dt", "cents")
    val a = Cohorts.cohortLtv(orders, "u", "dt", "cents").collect()
    assert(a.map(_.getAs[Double]("ltv_cents")).toSeq ==
      Seq(200.0, 500.0))
    val b = Cohorts.cohortLtv(orders.repartition(5), "u", "dt", "cents")
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
