package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SequencesSpec extends AnyFunSuite with SparkSuite {

  private def ev = {
    import spark.implicits._
    // user 1: a b a b ; user 2: a a b ; user 3: c (no transitions)
    Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "b"),
      (3L, 1L, "c")
    ).toDF("user_id", "seq", "state")
  }

  private def trans = Sequences.transitions(ev, Seq("user_id"), Seq("seq"), "state")

  test("counts: consecutive pairs within each sequence, none across users") {
    val got = trans.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user1: a->b, b->a, a->b ; user2: a->a, a->b
    assert(got == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("a", "a") -> 1L))
  }

  test("probabilities are row-conditional per from_state") {
    val got = trans.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("a", "b")) == 0.75) // 3 of the 4 transitions out of a
    assert(got(("a", "a")) == 0.25)
    assert(got(("b", "a")) == 1.0)
  }

  test("single-element sequences contribute nothing") {
    assert(!trans.collect().exists(r => r.getString(0) == "c" || r.getString(1) == "c"))
  }

  test("topTransitions keeps k per source, count-desc with state tiebreak") {
    val top = Sequences.topTransitions(ev, Seq("user_id"), Seq("seq"), "state", k = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top == Map("a" -> "b", "b" -> "a"))
  }

  test("order columns break ties deterministically (secondary key)") {
    import spark.implicits._
    // same primary order value: secondary key decides  a(1),b(1,id2),c(1,id3)
    val df = Seq((1L, 1L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 1L, 3L, "c"))
      .toDF("user_id", "t", "id", "state")
    val got = Sequences.transitions(df, Seq("user_id"), Seq("t", "id"), "state")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")))
  }

  test("transitionEntropy hand-computed: H and predictability") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: a->b->a ; u2: a->a. counts: a->b 1, a->a 1, b->a 1
    // h(a) = ln 2, h(b) = 0; h_rate = (2/3) ln 2; K_to = 2 -> h_max = ln 2
    val rows = Seq((1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L),
      (1L, "a", ts(3), 3L), (2L, "a", ts(1), 4L), (2L, "a", ts(2), 5L))
      .toDF("u", "state", "ts", "eid")
    val out = Sequences.transitionEntropy(rows, Seq("u"),
      Seq("ts", "eid"), "state")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    val ln2 = math.log(2.0)
    assert(out("a")._1 == 2L)
    assert(math.abs(out("a")._2 - ln2) < 1e-6)
    assert(out("b")._2 == 0.0)
    assert(math.abs(out("a")._3 - 2.0 / 3.0 * ln2) < 1e-6)
    assert(math.abs(out("a")._4 - (1.0 - 2.0 / 3.0)) < 1e-6)
  }

  test("transitionEntropy: deterministic loops read zero, uniform reads h_max") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val det = (1 to 20).map(i =>
      (1L, if (i % 2 == 0) "a" else "b", ts(i), i.toLong))
      .toDF("u", "state", "ts", "eid")
    val r = Sequences.transitionEntropy(det, Seq("u"), Seq("ts", "eid"),
      "state").head()
    assert(r.getDouble(3) == 0.0, "alternating chain is fully predictable")
    assert(r.getDouble(5) == 1.0)
  }

  test("gapSensitivity: hand-computed session counts per threshold") {
    import spark.implicits._
    // user A gaps: 100, 400; user B: single event (no gaps)
    val df = Seq(("a", 0L), ("a", 100L), ("a", 500L), ("b", 7L))
      .toDF("u", "sec")
      .select($"u", to_timestamp($"sec").as("ts"))
    val out = Sequences.gapSensitivity(df, "u", "ts", Seq(50L, 200L, 1000L))
      .collect().map(r => r.getAs[Long]("threshold_s") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_sessions"))).toMap
    assert(out(50L) == ((2L, 4L, 4L)))   // both gaps break
    assert(out(200L) == ((2L, 4L, 3L)))  // only the 400s gap breaks
    assert(out(1000L) == ((2L, 4L, 2L))) // nothing breaks
  }

  test("gapSensitivity: gapless corpus still reports every threshold") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("u", "sec")
      .select($"u", to_timestamp($"sec").as("ts"))
    val out = Sequences.gapSensitivity(df, "u", "ts", Seq(60L, 600L))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_sessions") == 3L))
  }

  test("gapRegularity: a metronome flags at CV2 = 0, bursty traffic " +
    "does not; totals and ordering are exact") {
    import spark.implicits._
    val metronome = (1 to 30).map(i => ("bot", i.toLong * 120))
    // bursty: alternating 10s / 1000s gaps -> CV2 >> 0.09
    val bursty = (1 to 30).map(i =>
      ("human", (i / 2) * 1010L + (i % 2) * 10L))
    val df = (metronome ++ bursty).toDF("u", "sec")
      .select($"u", to_timestamp($"sec").as("ts"))
    val out = Sequences.gapRegularity(df, "u", "ts", minGaps = 10,
      cvThreshold = 0.3, k = 10).collect()
    assert(out.length == 2)
    // ascending cv2: the bot leads
    assert(out.head.getAs[String]("u") == "bot")
    assert(out.head.getAs[Double]("cv2") == 0.0)
    assert(out.head.getAs[Boolean]("flagged"))
    assert(!out(1).getAs[Boolean]("flagged"))
    assert(out.head.getAs[Long]("n_evaluated") == 2L)
    assert(out.head.getAs[Long]("n_flagged") == 1L)
  }

  test("gapRegularity: hand-computed CV2; minGaps excludes thin users") {
    import spark.implicits._
    // gaps 1,1,4: n=3, s1=6, s2=18 -> cv2 = 3*18/36 - 1 = 0.5
    val df = Seq(("a", 0L), ("a", 1L), ("a", 2L), ("a", 6L),
      ("thin", 0L), ("thin", 5L))
      .toDF("u", "sec").select($"u", to_timestamp($"sec").as("ts"))
    val out = Sequences.gapRegularity(df, "u", "ts", minGaps = 3,
      cvThreshold = 0.5, k = 10).collect()
    assert(out.length == 1 && out.head.getAs[String]("u") == "a")
    assert(out.head.getAs[Double]("cv2") == 0.5)
    assert(out.head.getAs[Long]("sum_gap_s") == 6L)
  }

  test("gapSensitivity: partitioning-invariant; refuses bad thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (1 to 600).map(_ => (s"u${rnd.nextInt(20)}",
      rnd.nextInt(100000).toLong)).toDF("u", "sec")
      .select($"u", to_timestamp($"sec").as("ts"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sequences.gapSensitivity(d, "u", "ts", Seq(60L, 1800L, 7200L))
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
    intercept[IllegalArgumentException](
      Sequences.gapSensitivity(df, "u", "ts", Seq(900L, 300L)))
    intercept[IllegalArgumentException](
      Sequences.gapSensitivity(df, "u", "ts", Seq.empty))
  }
}
