package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the streak histogram: hand-placed runs with a
  * gap, same-day duplicate events collapsing, and partition
  * invariance (all-integer operator — results must be identical). */
class StreaksSpec extends AnyFunSuite with SparkSuite {
  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s + " 10:00:00")

  test("hand-placed runs: 3-day run beats a later 2-day run; gaps split") {
    import spark.implicits._
    val ev = Seq(
      // u1: 3-day run, gap, 2-day run → best 3
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")), (1L, ts("2024-01-03")),
      (1L, ts("2024-01-10")), (1L, ts("2024-01-11")),
      // u2: single day → best 1; duplicate same-day events collapse
      (2L, ts("2024-02-05")), (2L, ts("2024-02-05"))
    ).toDF("user_id", "t")
    val out = Streaks.longestDailyStreak(ev.repartition(4), "user_id", "t")
      .collect().map(r => (r.getAs[Long]("streak_len"),
        r.getAs[Long]("users")))
    assert(out.toSeq == Seq((1L, 1L), (3L, 1L)))
  }

  test("a run spanning a month boundary counts as one streak") {
    import spark.implicits._
    val ev = Seq((5L, ts("2024-01-30")), (5L, ts("2024-01-31")),
      (5L, ts("2024-02-01")), (5L, ts("2024-02-02"))).toDF("user_id", "t")
    val out = Streaks.longestDailyStreak(ev, "user_id", "t").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("streak_len") == 4L)
  }
}
