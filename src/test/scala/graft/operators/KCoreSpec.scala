package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class KCoreSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def core(k: Int, pairs: (Long, Long)*): Map[Long, Long] =
    KCore.kcore(pairs.toDF("a", "b"), "a", "b", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a tail: 2-core keeps exactly the triangle") {
    val got = core(2, 1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peeling cascades: a chain peels end-in until nothing survives") {
    // path 1-2-3-4-5: every round exposes new degree-1 endpoints
    assert(core(2, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L).isEmpty)
  }

  test("K4 is its own 3-core; 4-core of K4 is empty") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(core(3, k4: _*) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(core(4, k4: _*).isEmpty)
  }

  test("deleting the bridge node splits survival: two triangles joined by one node") {
    // triangles {1,2,3} and {4,5,6} joined by edge 3-4: both survive k=2
    // (3 and 4 keep degree 2 inside their triangles)
    val got = core(2, 1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 3L -> 4L)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got(3L) == 3L && got(4L) == 3L) // bridge endpoints keep the bridge edge
    // k=3: the bridge edge alone cannot hold — everything peels
    assert(core(3, 1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 3L -> 4L).isEmpty)
  }

  test("duplicates, reversals, and self-loops collapse") {
    val got = core(2, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 1L)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("result is invariant to input partitioning") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 1L, 4L -> 5L)
    val one = KCore.kcore(pairs.toDF("a", "b").repartition(1), "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = KCore.kcore(pairs.toDF("a", "b").repartition(7), "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("non-convergence within maxRounds fails loudly") {
    // the 5-chain needs 2 peel rounds at k=2; maxRounds=1 must throw
    val ex = intercept[IllegalArgumentException] {
      KCore.kcore(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L).toDF("a", "b"),
        "a", "b", 2, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("maxRounds"))
  }
}
