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

  test("harmonic centrality: hand-computed path graph, per-seed distances") {
    // path 1-2-3-4, seeds {1, 4}: H(2) = 1/1 + 1/2; H(3) = 1/2 + 1/1;
    // H(1) = 1/3 (from seed 4 only; self contributes 0), symmetric H(4)
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val m = Bfs.harmonicCentrality(pairs.toDF("a", "b"), "a", "b",
        seeds = Seq(1L, 4L), maxHops = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(2L) == ((2L, 1.0 + 0.5)) && m(3L) == ((2L, 0.5 + 1.0)))
    assert(m(1L) == ((1L, 1.0 / 3)) && m(4L) == ((1L, 1.0 / 3)))
  }

  test("harmonic centrality: disconnection contributes zero, ids guarded") {
    val pairs = Seq(1L -> 2L, 10L -> 11L)
    val m = Bfs.harmonicCentrality(pairs.toDF("a", "b"), "a", "b",
        seeds = Seq(1L), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m == Map(2L -> 1.0)) // island {10, 11} absent, not infinite
    val e = intercept[Exception] {
      Bfs.harmonicCentrality(Seq((1L << 41) -> 2L).toDF("a", "b"), "a", "b",
        Seq(1L), 2).collect()
    }
    assert(e.getMessage.contains("node id out of") ||
      Option(e.getCause).exists(_.getMessage.contains("node id out of")))
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
