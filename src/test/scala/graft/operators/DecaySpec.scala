package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DecaySpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2026-01-${day}%02d 12:00:00")

  test("hand-computed half-life: today full, one period half, two periods quarter") {
    // periodDays=7, ref = day 29; ages: day29 -> 0, day22 -> 1, day15 -> 2
    val rows = Seq(("u", ts(29), 8.0), ("u", ts(22), 8.0), ("u", ts(15), 8.0))
    val m = Decay.halfLife(rows.toDF("g", "ts", "value"), "g", "ts", "value", 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("u") == ((3L, 8.0 + 4.0 + 2.0)))
  }

  test("age clamps at maxAge instead of vanishing or overflowing") {
    val rows = Seq(("u", ts(29), 4.0), ("u", Timestamp.valueOf("2020-01-01 00:00:00"), 4.0))
    val m = Decay.halfLife(rows.toDF("g", "ts", "value"), "g", "ts", "value", 7, maxAge = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("u") == 4.0 + 0.5) // 4·2⁰ + 4·2⁻³
  }

  test("cent-level values stay exact through the decimal path") {
    val rows = Seq(("u", ts(29), 0.03), ("u", ts(22), 0.02))
    val m = Decay.halfLife(rows.toDF("g", "ts", "value"), "g", "ts", "value", 7)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("u") == 0.03 + 0.01) // 0.02/2 exactly (dyadic cents)
  }

  test("partitioning-invariant on real events (order-independent decimal sums)") {
    val e = graft.Tables.t(spark, sf, "events").select("user_id", "ts", "value")
    val a = Decay.halfLife(e.coalesce(1), "user_id", "ts", "value", 7)
      .orderBy("user_id").collect().toSeq
    val b = Decay.halfLife(e.repartition(13), "user_id", "ts", "value", 7)
      .orderBy("user_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
