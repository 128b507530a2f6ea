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

  test("growth accounting: every flow class lands where planted") {
    import spark.implicits._
    // weeks (epoch day // 7): pin days inside known weeks
    // u1 active w0+w1 (retained); u2 active w0 only (churns into w1);
    // u3 first appears w1 (new); u4 active w0, skips w1, returns w2
    // (resurrected in w2)
    def day(week: Long, off: Long) =
      new Timestamp((week * 7 + off) * 86400000L)
    val ev = Seq(
      (1L, day(2800, 1)), (1L, day(2801, 1)),
      (2L, day(2800, 2)),
      (3L, day(2801, 3)),
      (4L, day(2800, 4)), (4L, day(2802, 4)),
      (1L, day(2802, 5))).toDF("user_id", "t")
    val out = Turnover.weeklyGrowthAccounting(ev.repartition(3),
      "user_id", "t").collect()
      .map(r => (r.getAs[Long]("week"), r.getAs[Long]("active"),
        r.getAs[Long]("new_users"), r.getAs[Long]("retained"),
        r.getAs[Long]("resurrected"), r.getAs[Long]("churned")))
    assert(out.toSeq == Seq(
      (2800L, 3L, 3L, 0L, 0L, 0L),
      (2801L, 2L, 1L, 1L, 0L, 2L),
      (2802L, 2L, 0L, 1L, 1L, 1L)))
    // identity: active = new + retained + resurrected, every row
    out.foreach { case (_, a, n, r, res, _) => assert(a == n + r + res) }
  }
}
