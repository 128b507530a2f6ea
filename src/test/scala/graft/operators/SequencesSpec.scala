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
}
