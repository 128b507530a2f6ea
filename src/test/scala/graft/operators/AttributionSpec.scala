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

  private def shapleyFixture = {
    import spark.implicits._
    // exposure-set rates: v(∅)=1/4, v(a)=3/4, v(b)=2/4, v(ab)=4/4
    val rows =
      (1 to 4).map(u => (u.toLong, "other")) ++ Seq((1L, "buy")) ++
        (5 to 8).map(u => (u.toLong, "a")) ++
        (5 to 7).map(u => (u.toLong, "buy")) ++
        (9 to 12).map(u => (u.toLong, "b")) ++
        (9 to 10).map(u => (u.toLong, "buy")) ++
        (13 to 16).flatMap(u =>
          Seq((u.toLong, "a"), (u.toLong, "b"), (u.toLong, "buy")))
    rows.toDF("user", "ch")
  }

  test("shapley: hand-computed values satisfy efficiency when every " +
    "coalition is observed") {
    // phi_a = .5(v_a - v_0) + .5(v_ab - v_b) = .5(.5) + .5(.5) = .5
    // phi_b = .5(.25) + .5(.25) = .25; sum = v(full) - v(empty) = .75
    val out = Attribution.shapley(shapleyFixture, "user", "ch", "buy",
      Seq("a", "b")).collect()
    val m = out.map(r => r.getAs[String]("channel") -> r).toMap
    assert(m("a").getAs[Double]("shapley") == 0.5)
    assert(m("b").getAs[Double]("shapley") == 0.25)
    assert(m("a").getAs[Long]("n_exposed") == 8L)
    assert(m("a").getAs[Long]("x_exposed") == 7L)
    assert(m("a").getAs[Double]("v_full") == 1.0)
    assert(m("a").getAs[Double]("v_empty") == 0.25)
    assert(m("a").getAs[Long]("n_units") == 16L)
  }

  test("shapley: an unobserved coalition contributes zero rate " +
    "(the documented convention)") {
    import spark.implicits._
    val noB = shapleyFixture.filter(
      !org.apache.spark.sql.functions.col("user").between(9, 12))
    // v(b) now unobserved -> 0: phi_a = .5(.5) + .5(1-0) = .75,
    // phi_b = .5(0-.25) + .5(1-.75) = 0
    val out = Attribution.shapley(noB, "user", "ch", "buy", Seq("a", "b"))
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Double]("shapley")).toMap
    assert(out("a") == 0.75)
    assert(out("b") == 0.0)
  }

  test("shapley: partitioning-invariant; refuses bad channel lists") {
    val df = shapleyFixture
    val a = Attribution.shapley(df.coalesce(1), "user", "ch", "buy",
      Seq("a", "b")).collect().map(_.toString).toSeq
    val b = Attribution.shapley(df.repartition(7), "user", "ch", "buy",
      Seq("a", "b")).collect().map(_.toString).toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      Attribution.shapley(df, "user", "ch", "buy", Seq("a")))
    intercept[IllegalArgumentException](
      Attribution.shapley(df, "user", "ch", "buy", Seq("a", "a")))
    intercept[IllegalArgumentException](
      Attribution.shapley(df, "user", "ch", "buy", Seq("a", "buy")))
  }
}
