package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class LabelPropSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def labels(iters: Int, pairs: (Long, Long)*): Map[Long, Long] =
    LabelProp.run(pairs.toDF("a", "b"), "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one edge resolve to two communities") {
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = labels(4, (c1 ++ c2 :+ (4L -> 11L)): _*)
    // each clique converges to its minimum label
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((11L to 14L).map(got).toSet.size == 1)
    assert(got(1L) != got(11L), "the bridge must not merge the cliques")
  }

  test("one iteration of a star: spokes adopt the hub's label via tie-break") {
    // hub 1, spokes 2..4. Spoke votes: hub's label 1 (×1) + self (×1) —
    // tie, smallest label wins → all spokes take 1. Hub: three spoke
    // votes (2,3,4, one each) + self 1 — four-way tie → 1.
    val got = labels(1, 1L -> 2L, 1L -> 3L, 1L -> 4L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("self-vote damps the bipartite 2-cycle") {
    // single edge 1-2: without self-votes labels swap forever; with
    // them, node 2's vote is {1:1, 2:1} → tie → 1; node 1: {1:1, 2:1} → 1
    assert(labels(3, 1L -> 2L) == Map(1L -> 1L, 2L -> 1L))
  }

  test("zero iterations: every node is its own label") {
    assert(labels(0, 1L -> 2L, 2L -> 3L) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("majority beats tie-break: more votes win over a smaller label id") {
    // round 1: the {10,11,12,13} clique-ish block ties everywhere and
    // takes min label 10; node 10 itself ties across {11,12,13,1,self}
    // and takes 1. Round 2: node 10's votes are {10:3 (clique), 1:2
    // (neighbor 1 + self)} — label 10 WINS on count despite 1 < 10.
    val cl = Seq(11L -> 12L, 11L -> 13L, 12L -> 13L,
      10L -> 11L, 10L -> 12L, 10L -> 13L, 1L -> 10L)
    val got = labels(2, cl: _*)
    assert(got(10L) == 10L, s"majority must beat the smaller label: $got")
    assert(got(11L) == 10L && got(12L) == 10L && got(13L) == 10L)
    assert(got(1L) == 1L)
  }

  test("stopWhenStable: a converged graph stops early and equals the full run") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    // the triangle converges to all-1 in one round; 50 budgeted rounds
    // with early stop must land on the identical table
    val full = LabelProp.run(pairs.toDF("a", "b"), "a", "b", 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val early = LabelProp.run(pairs.toDF("a", "b"), "a", "b", 50,
        stopWhenStable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(early == full)
    assert(early == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("result is invariant to input partitioning") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val one = LabelProp.run(pairs.toDF("a", "b").repartition(1), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = LabelProp.run(pairs.toDF("a", "b").repartition(7), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }
}
