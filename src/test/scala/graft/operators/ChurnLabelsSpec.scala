package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ChurnLabelsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")

  test("hand-computed gaps and labels at horizon 7") {
    // user 1 active on days 1, 5, 20; observation ends day 28 (user 2)
    val ev = Seq((1L, ts(1)), (1L, ts(5)), (1L, ts(20)), (2L, ts(28)))
      .toDF("user_id", "ts")
    val out = ChurnLabels.labels(ev, "user_id", "ts", 7)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((Option(r.get(2)), Option(r.get(3)).map(_.asInstanceOf[Boolean]),
          r.getBoolean(4)))).toMap
    assert(out((1L, "2024-03-01")) == ((Some(4), Some(false), false))) // returned in 4d
    assert(out((1L, "2024-03-05")) == ((Some(15), Some(true), false))) // gap 15 > 7
    assert(out((1L, "2024-03-20")) == ((None, Some(true), false)))     // never returned, 8d observed
    assert(out((2L, "2024-03-28")) == ((None, None, true)))            // censored: 0d of future
  }

  test("a return exactly at the horizon is NOT churn (> rule)") {
    val ev = Seq((1L, ts(1)), (1L, ts(8)), (9L, ts(28))).toDF("user_id", "ts")
    val out = ChurnLabels.labels(ev, "user_id", "ts", 7)
      .filter("user = 1 AND day = DATE '2024-03-01'").head()
    assert(out.getInt(2) == 7 && !out.getBoolean(3))
  }

  test("censoring: a last-week day with an observed return inside the horizon is labeled") {
    // day 25 with return day 27: future partially observed BUT the return
    // arrived -> honest negative label, not censored
    val ev = Seq((1L, ts(25)), (1L, ts(27)), (2L, ts(28))).toDF("user_id", "ts")
    val out = ChurnLabels.labels(ev, "user_id", "ts", 7)
      .filter("user = 1 AND day = DATE '2024-03-25'").head()
    assert(!out.getBoolean(4) && !out.getBoolean(3))
  }

  test("same-day duplicate events collapse; NULL ts excluded") {
    val ev = Seq((1L, ts(1)), (1L, ts(1)), (1L, ts(2)),
      (1L, null.asInstanceOf[Timestamp])).toDF("user_id", "ts")
    val out = ChurnLabels.labels(ev, "user_id", "ts", 7)
    assert(out.count() == 2)
  }

  test("invariant to partitioning") {
    val ev = (1 to 300).map(i => ((i % 9).toLong, ts(i % 27 + 1))).toDF("user_id", "ts")
    def run(df: org.apache.spark.sql.DataFrame) =
      ChurnLabels.labels(df, "user_id", "ts", 7)
        .orderBy("user", "day").collect().map(_.toSeq).toSeq
    assert(run(ev) == run(ev.repartition(11)))
  }
}
