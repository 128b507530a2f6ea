package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for adoption-order rules: a hand-placed strict
  * ordering, the same-day-tie exclusion (neither direction), and the
  * antisymmetry identity n_ordered(a,b) + n_ordered(b,a) + ties =
  * n_both. */
class AdoptionOrderSpec extends AnyFunSuite with SparkSuite {
  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s + " 09:00:00")

  test("hand-placed ordering with a same-day tie") {
    import spark.implicits._
    // u1: A day1, B day2 (A before B); u2: A and B both day3 (tie);
    // u3: B day4, A day5 (B before A); u4: A only
    val ev = Seq(
      (1L, "A", "2024-01-01"), (1L, "B", "2024-01-02"),
      (2L, "A", "2024-01-03"), (2L, "B", "2024-01-03"),
      (3L, "B", "2024-01-04"), (3L, "A", "2024-01-05"),
      (4L, "A", "2024-01-06"))
      .map { case (u, i, d) => (u, i, ts(d)) }.toDF("u", "i", "t")
    val out = AdoptionOrder.rules(ev.repartition(3), "u", "i", "t")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_both"),
          r.getAs[Long]("n_ordered")))).toMap
    // A→B: n_a = 4 users with A, both = 3, ordered strictly = 1 (u1)
    assert(out(("A", "B")) == ((4L, 3L, 1L)))
    // B→A: ordered strictly = 1 (u3); the u2 tie counts for NEITHER
    assert(out(("B", "A")) == ((3L, 3L, 1L)))
  }

  test("duplicate events collapse to the first adoption day") {
    import spark.implicits._
    val ev = Seq((1L, "A", ts("2024-02-05")), (1L, "A", ts("2024-02-01")),
      (1L, "B", ts("2024-02-03"))).toDF("u", "i", "t")
    val out = AdoptionOrder.rules(ev, "u", "i", "t").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n_ordered"))).toMap
    // first A = Feb 1 < first B = Feb 3
    assert(out(("A", "B")) == 1L)
    assert(!out.contains(("B", "A")) || out(("B", "A")) == 0L)
  }

  test("refuses an unbounded vocabulary") {
    import spark.implicits._
    val wide = (1L to 3000L).map(i => (i % 7, s"item$i", ts("2024-01-01")))
      .toDF("u", "i", "t")
    assert(intercept[IllegalArgumentException] {
      AdoptionOrder.rules(wide, "u", "i", "t")
    }.getMessage.contains("vocabulary-level"))
  }
}
