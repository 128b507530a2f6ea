package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class InterpolateSpec extends AnyFunSuite with SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("recovers a linear signal exactly at every grid point") {
    import spark.implicits._
    // v(t) = slope * minutes since 00:30; observations at :30 offsets
    val rows = (0 until 5).map { i =>
      (1L, ts(f"2024-01-01 0$i:30:00"), i * 60.0)
    }
    val out = Interpolate.linearGrid(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .orderBy("ts").collect()
    // grid 01:00..04:00; v at 01:00 = 30 (halfway between 0 and 60)
    assert(out.length == 4)
    assert(out.map(_.getDouble(2)).toSeq == Seq(30.0, 90.0, 150.0, 210.0))
  }

  test("an observation exactly on the grid passes through untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 01:00:00"), 7.5),
      (1L, ts("2024-01-01 03:00:00"), 9.5))
    val out = Interpolate.linearGrid(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .orderBy("ts").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(7.5, 8.5, 9.5))
  }

  test("keys interpolate independently; single-obs keys yield their point or nothing") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1.0), (1L, ts("2024-01-01 02:00:00"), 3.0),
      (2L, ts("2024-01-01 05:00:00"), 42.0), // on-grid single obs
      (3L, ts("2024-01-01 05:30:00"), 9.0))  // off-grid single obs: empty grid
    val out = Interpolate.linearGrid(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    assert(out.count(_._1 == 1L) == 2)
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(42.0))
    assert(!out.exists(_._1 == 3L))
  }

  test("one shuffle serves both neighbor scans") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (i.toLong % 5, ts(f"2024-01-01 ${i % 24}%02d:17:00"), i * 1.0))
    val plan = Interpolate.linearGrid(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"window scans re-shuffled:\n$plan") // union sides partial-agg once
  }
}
