package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the Little's law audit: hand-computed
  * sessions/boundaries on a planted timeline, near-zero gap in the
  * steady-state limit, partition invariance, and refusals. */
class QueueingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("hand-computed: sessions, boundary counts, and the identity side") {
    // user 1: one session [60s, 300s) -> dur 240s, minute boundaries
    // at 120,180,240,300 -> 300/60 - 60/60 = 4
    // user 2: one session [0s, 0s) (single event) -> dur 0, 0 boundaries
    val df = Seq((1L, ts(60)), (1L, ts(300)), (2L, ts(0)))
      .toDF("u", "t")
    val out = Queueing.littleLaw(df, "u", "t", gapUs = 3600L * 1000000)
      .head()
    assert(out.getAs[Long]("n_sessions") == 2L)
    assert(out.getAs[Long]("span_sec") == 300L)
    assert(out.getAs[Double]("w_mean_sec") == 120.0)
    assert(out.getAs[Double]("l_identity") == 0.8)   // 240/300
    assert(out.getAs[Double]("l_sampled") == 0.8)    // 4 boundaries / 5
  }

  test("the gap rule actually splits sessions") {
    val df = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(5000)), (1L, ts(5010)))
      .toDF("u", "t")
    val out = Queueing.littleLaw(df, "u", "t", gapUs = 3600L * 1000000)
      .head()
    assert(out.getAs[Long]("n_sessions") == 2L)
    assert(out.getAs[Double]("w_mean_sec") == 10.0)
  }

  test("steady state: the sampled and identity reads converge") {
    // 50 users, each one long session (events every 1000 s, inside the
    // 6 h gap) covering most of the window: edge effects are tiny
    val rows = (0L until 50L).flatMap { u =>
      (0L to 36L).map(i => (u, ts(u * 7 + i * 1000)))
    }.toDF("u", "t")
    val out = Queueing.littleLaw(rows, "u", "t").head()
    assert(math.abs(out.getAs[Double]("rel_gap")) < 0.01, out.toString)
    assert(out.getAs[Double]("l_identity") > 45.0)
  }

  test("partition-invariant; refuses single sessions and zero span") {
    val rows = (0L until 20L).flatMap { u =>
      Seq((u, ts(u * 100)), (u, ts(u * 100 + 500)))
    }.toDF("u", "t")
    val a = Queueing.littleLaw(rows, "u", "t").head().toString
    val b = Queueing.littleLaw(rows.repartition(7), "u", "t")
      .head().toString
    assert(a == b)
    assert(intercept[IllegalArgumentException] {
      Queueing.littleLaw(Seq((1L, ts(0)), (1L, ts(5))).toDF("u", "t"),
        "u", "t")
    }.getMessage.contains("session"))
  }

  test("refuses all-instantaneous sessions (rel_gap denominator is 0)") {
    // every session is a single event: durUs = 0, so l_identity = 0 and
    // rel_gap would read NaN/Infinity — the operator must refuse loudly
    val rows = (0L until 5L).map(u => (u, ts(u * 120))).toDF("u", "t")
    assert(intercept[IllegalArgumentException] {
      Queueing.littleLaw(rows, "u", "t")
    }.getMessage.contains("zero total session duration"))
  }
}
