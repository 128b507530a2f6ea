package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class AttributionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("user", "ts0", "eid", "type")
      .select(col("user"), col("ts0").cast("timestamp").as("ts"),
        col("eid"), col("type"))

  test("hand-computed first/last/linear credit over two paths") {
    // user 1: view(1) click(2) conv(3) | click(4) conv(5)
    // user 2: conv(6) with no touches  | view(7) dangling (no next conv)
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 2L, "click"),
      (1L, "2024-01-01 10:02:00", 3L, "buy"),
      (1L, "2024-01-01 10:03:00", 4L, "click"),
      (1L, "2024-01-01 10:04:00", 5L, "buy"),
      (2L, "2024-01-01 09:00:00", 6L, "buy"),
      (2L, "2024-01-01 11:00:00", 7L, "view"))
    val out = Attribution.credit(df, "user", "ts", "eid", "type", "buy")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // path 1 (conv 3): view first, click last, linear ½ each
    // path 2 (conv 5): click only — first, last, linear 1
    assert(out("view") == ((1L, 0L, 0.5, 1L)))
    assert(out("click") == ((1L, 2L, 1.5, 2L)))
    val anyRow = Attribution.credit(df, "user", "ts", "eid", "type", "buy")
      .head()
    assert(anyRow.getAs[Long]("n_conversions") == 3L)
    assert(anyRow.getAs[Long]("n_attributed") == 2L)
    assert(anyRow.getAs[Long]("n_unattributed") == 1L)
  }

  test("same-timestamp ties break by event id") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 2L, "b_ch"),
      (1L, "2024-01-01 10:00:00", 1L, "a_ch"),
      (1L, "2024-01-01 10:01:00", 3L, "buy"))
    val out = Attribution.credit(df, "user", "ts", "eid", "type", "buy")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("a_ch") == ((1L, 0L))) // eid 1 is first
    assert(out("b_ch") == ((0L, 1L)))
  }

  test("partitioning-invariant") {
    val rows = (1L to 400L).map { i =>
      val tpe = if (i % 7 == 0) "buy" else Seq("view", "click", "ad")((i % 3).toInt)
      (i % 13, f"2024-01-01 ${(i % 24)}%02d:${(i % 60)}%02d:00", i, tpe)
    }
    val df = ev(rows: _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      Attribution.credit(d, "user", "ts", "eid", "type", "buy")
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(17)))
  }
}
