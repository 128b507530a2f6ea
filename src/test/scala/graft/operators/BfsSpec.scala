package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BfsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def hops(srcs: Seq[Long], maxHops: Int,
                   pairs: (Long, Long)*): Map[Long, Long] =
    Bfs.hops(pairs.toDF("a", "b"), "a", "b", srcs.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain distances from one end") {
    val got = hops(Seq(1L), 10, 1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("maxHops truncates the reach") {
    val got = hops(Seq(1L), 2, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("multi-source takes the nearest seed; edges are undirected") {
    // 1-2-3-4-5 seeded at both ends: middle node is 2 hops from either
    val got = hops(Seq(1L, 5L), 10, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(got == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("disconnected components stay unreached; isolated seeds are dist 0") {
    val got = hops(Seq(1L, 99L), 10, 1L -> 2L, 5L -> 6L)
    assert(got == Map(1L -> 0L, 99L -> 0L, 2L -> 1L))
  }

  test("early exhaustion: extra hop budget changes nothing") {
    val tight = hops(Seq(1L), 2, 1L -> 2L, 2L -> 3L)
    val loose = hops(Seq(1L), 50, 1L -> 2L, 2L -> 3L)
    assert(tight == loose)
  }

  test("result is invariant to input partitioning") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 5L, 5L -> 6L)
    val one = Bfs.hops(pairs.toDF("a", "b").repartition(1), "a", "b",
        Seq(1L).toDF("node"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Bfs.hops(pairs.toDF("a", "b").repartition(7), "a", "b",
        Seq(1L).toDF("node"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }
}
