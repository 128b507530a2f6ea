package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.to_timestamp
import graft.SparkSuite
import java.sql.Timestamp

class FunnelSpec extends AnyFunSuite with SparkSuite {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def run(rows: Seq[(Long, String, Timestamp)]) = {
    import spark.implicits._
    Funnel.conversion(rows.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map { r =>
        def d(i: Int): Double =
          if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
        r.getInt(0) -> ((r.getString(1), r.getLong(2), d(3), d(4)))
      }.toMap
  }

  test("strict ordering: steps only count after the previous step's first hit") {
    val rows = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // purchase BEFORE any click → step 3 not reached
      (2L, "view", ts(5)), (2L, "purchase", ts(4)),
      // click with no view at all → user never enters the funnel
      (3L, "click", ts(1)))
    val m = run(rows)
    assert(m(1) == (("view", 2L, 1.0, 1.0)))
    assert(m(2) == (("click", 1L, 0.5, 0.5)))
    assert(m(3) == (("purchase", 1L, 1.0, 0.5)))
  }

  test("events before the first-step anchor are ignored, later re-hits count") {
    // click@1 precedes view@2 so t2 anchors to click@3, purchase@4 converts
    val rows = Seq((4L, "click", ts(1)), (4L, "view", ts(2)),
      (4L, "click", ts(3)), (4L, "purchase", ts(4)))
    val m = run(rows)
    assert(m(1)._2 == 1L && m(2)._2 == 1L && m(3)._2 == 1L)
  }

  test("simultaneous timestamps do NOT convert (strictly-after semantics)") {
    val rows = Seq((5L, "view", ts(1)), (5L, "click", ts(1)))
    val m = run(rows)
    assert(m(1)._2 == 1L && m(2)._2 == 0L)
  }

  test("duplicate steps and oversize funnels fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    assert(intercept[IllegalArgumentException] {
      Funnel.conversion(df, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      Funnel.conversion(df, "user_id", "event_type", "ts",
        (1 to 17).map(i => s"s$i"))
    }.getMessage.contains("steps"))
  }

  test("stageTiming: hand-computed quartiles with strict stage order") {
    import spark.implicits._
    val rows = Seq(
      ("u1", "s", 0L), ("u1", "v", 10L), ("u1", "c", 30L),
      ("u2", "s", 0L), ("u2", "v", 20L), ("u2", "c", 100L),
      ("u3", "s", 0L), ("u3", "v", 30L),            // no click
      ("u4", "v", 5L),                               // never signed up
      // u5's click PRECEDES its view: must not count for pair 2
      ("u5", "s", 0L), ("u5", "c", 5L), ("u5", "v", 40L))
    val df = rows.toDF("u", "t", "sec")
      .select($"u", $"t", to_timestamp($"sec").as("ts"))
    val out = Funnel.stageTiming(df, "u", "t", "ts", Seq("s", "v", "c"))
      .collect()
    assert(out.length == 2)
    val p1 = out.find(_.getAs[Long]("step_idx") == 1L).get
    // pair s->v deltas: 10, 20, 30, 40 -> n=4, p25=10, med=20, p75=30
    assert(p1.getAs[String]("stage_from") == "s" &&
      p1.getAs[String]("stage_to") == "v")
    assert(p1.getAs[Long]("n_users") == 4L)
    assert(p1.getAs[Long]("p25_s") == 10L)
    assert(p1.getAs[Long]("median_s") == 20L)
    assert(p1.getAs[Long]("p75_s") == 30L)
    val p2 = out.find(_.getAs[Long]("step_idx") == 2L).get
    // pair v->c deltas: u1: 20, u2: 80 (u3 no click, u5's click too
    // early) -> n=2, p25=med=20, p75=80
    assert(p2.getAs[Long]("n_users") == 2L)
    assert(p2.getAs[Long]("p25_s") == 20L)
    assert(p2.getAs[Long]("median_s") == 20L)
    assert(p2.getAs[Long]("p75_s") == 80L)
  }

  test("stageTiming: partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val rows = (1 to 80).flatMap { u =>
      val t0 = rnd.nextInt(1000).toLong
      Seq((s"u$u", "s", t0), (s"u$u", "v", t0 + rnd.nextInt(500) + 1L),
        (s"u$u", "c", t0 + rnd.nextInt(2000) + 600L))
    }
    val df = rows.toDF("u", "t", "sec")
      .select($"u", $"t", to_timestamp($"sec").as("ts"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Funnel.stageTiming(d, "u", "t", "ts", Seq("s", "v", "c"))
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(11)))
  }
}
