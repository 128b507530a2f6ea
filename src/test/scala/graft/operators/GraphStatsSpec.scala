package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class GraphStatsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def r(edges: Seq[(Long, Long)]): org.apache.spark.sql.Row =
    GraphStats.degreeAssortativity(edges.toDF("a", "b"), "a", "b").head()

  test("hand-computed: star graph is maximally disassortative (r = -1)") {
    // star K1,3: hub degree 3, leaves degree 1 — every edge joins (3, 1)
    val row = r(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(row.getLong(0) == 3L)
    assert(math.abs(row.getDouble(4) + 1.0) < 1e-12)
  }

  test("regular graph has zero degree variance: NULL, not 0 or NaN") {
    // a 4-cycle: every node degree 2
    val row = r(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(row.isNullAt(4))
  }

  test("hand-computed path graph P4") {
    // edges (0-1)(1-2)(2-3); degrees 1,2,2,1; directed pairs:
    // (1,2)(2,1)(2,2)(2,2)(2,1)(1,2): M=6 sx=10 sxx=18 sxy=16
    // r = (6*16-100)/(6*18-100) = -4/8 = -0.5
    val row = r(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(row.getLong(1) == 10L && row.getLong(2) == 18L && row.getLong(3) == 16L)
    assert(row.getDouble(4) == -0.5)
  }

  test("self-loops and duplicate/reversed edges are ignored") {
    val a = r(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    val b = r(Seq((0L, 1L), (1L, 0L), (0L, 1L), (2L, 2L), (0L, 2L), (0L, 3L)))
    assert(a.toSeq == b.toSeq)
  }

  test("invariant to input partitioning") {
    val edges = (1L to 200L).map(i => (i % 23, i % 17 + 23L))
    val df = edges.toDF("a", "b")
    val x = GraphStats.degreeAssortativity(df, "a", "b").head().toSeq
    val y = GraphStats.degreeAssortativity(df.repartition(13), "a", "b").head().toSeq
    assert(x == y)
  }
}
