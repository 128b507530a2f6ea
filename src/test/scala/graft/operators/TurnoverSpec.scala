package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for day-over-day turnover: a hand-placed flow
  * decomposition, the consecutive-days-only contract, and the
  * identity retained + new = active / retained + churned = prev. */
class TurnoverSpec extends AnyFunSuite with SparkSuite {
  import java.sql.Timestamp
  private def ts(d: String) = Timestamp.valueOf(d + " 12:00:00")

  test("hand-placed flows: retained/new/churned and jaccard") {
    import spark.implicits._
    // day1: {1,2,3}; day2: {2,3,4,5}  → retained 2, new 2, churned 1
    // jaccard = 2/(3+4−2) = 0.4
    val ev = Seq((1L, "2024-03-01"), (2L, "2024-03-01"), (3L, "2024-03-01"),
      (2L, "2024-03-02"), (3L, "2024-03-02"), (4L, "2024-03-02"),
      (5L, "2024-03-02"))
      .map { case (u, d) => (u, ts(d)) }.toDF("user_id", "t")
    val out = Turnover.dayOverDay(ev.repartition(3), "user_id", "t")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("prev_active") == 3L &&
      r.getAs[Long]("active") == 4L)
    assert(r.getAs[Long]("retained") == 2L &&
      r.getAs[Long]("new_users") == 2L && r.getAs[Long]("churned") == 1L)
    assert(r.getAs[Double]("jaccard") == 0.4)
  }

  test("non-consecutive days emit no flow row; disjoint sets read jaccard 0") {
    import spark.implicits._
    val ev = Seq((1L, ts("2024-03-01")), (1L, ts("2024-03-05")),
      (2L, ts("2024-03-06"))).toDF("user_id", "t")
    val out = Turnover.dayOverDay(ev, "user_id", "t").collect()
    // only 05→06 is consecutive; sets {1} vs {2} are disjoint
    assert(out.length == 1)
    assert(out.head.getAs[Long]("retained") == 0L)
    assert(out.head.getAs[Double]("jaccard") == 0.0)
  }
}
