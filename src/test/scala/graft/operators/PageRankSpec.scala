package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class PageRankSpec extends AnyFunSuite with SparkSuite {

  private val S = 1000000000000L

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame, iters: Int): Map[Long, Long] =
    PageRank.run(df, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is an exact fixed point at uniform mass") {
    // r = S/2 each: contribution S/2, update = 0.15*S/2 + 0.85*S/2 = S/2
    val r = ranks(edges(1L -> 2L, 2L -> 1L), iters = 7)
    assert(r == Map(1L -> S / 2, 2L -> S / 2))
  }

  test("one iteration of a 3-node chain matches the hand-computed integers") {
    // 1 -> 2 -> 3 (3 is dangling). r0 = S/3 each; base = 15*S/(100*3).
    val r = ranks(edges(1L -> 2L, 2L -> 3L), iters = 1)
    val r0 = S / 3
    val base = 15L * S / (100L * 3L)
    assert(r(1L) == base) // no in-edges
    assert(r(2L) == base + 85L * (r0 / 1L) / 100L)
    assert(r(3L) == base + 85L * (r0 / 1L) / 100L)
  }

  test("star graph concentrates rank on the hub; total mass is bounded by scale") {
    // spokes all point at the hub, hub points back at every spoke
    val spokes = (2L to 6L)
    val e = edges(spokes.map(_ -> 1L) ++ spokes.map(1L -> _): _*)
    val r = ranks(e, iters = 10)
    val hub = r(1L)
    assert(spokes.forall(s => r(s) < hub))
    assert(spokes.map(r).distinct.size == 1) // symmetric spokes tie exactly
    val total = r.values.sum
    assert(total <= S && total > S - 100) // only integer truncation loss
  }

  test("duplicate edges collapse: parallel edges do not double-count") {
    val once = ranks(edges(1L -> 2L, 2L -> 1L), iters = 3)
    val dup = ranks(edges(1L -> 2L, 1L -> 2L, 2L -> 1L), iters = 3)
    assert(once == dup)
  }

  test("result is invariant to input partitioning") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    assert(ranks(e, 4) == ranks(e.repartition(7), 4))
  }
}
