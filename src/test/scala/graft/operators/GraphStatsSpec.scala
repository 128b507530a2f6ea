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

  test("richClub: a hand-built hub clique over a sparse periphery " +
    "rises to phi = 1") {
    import spark.implicits._
    // 4-clique of hubs (1..4) + each hub also touching 3 leaves:
    // hub degree = 3 + 3 = 6; leaf degree = 1
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val leaves = for (h <- 1L to 4L; l <- 0L until 3L)
      yield (h, 100L + h * 10 + l)
    val df = (clique ++ leaves).toDF("a", "b")
    val out = GraphStats.richClub(df, "a", "b", maxK = 8).collect()
    val byK = out.map(r => r.getAs[Long]("k") -> r).toMap
    // k = 1: club = the 4 hubs (deg 6 > 1), edges among them = 6 ->
    // phi = 2*6/(4*3) = 1.0; leaves (deg 1) are out
    assert(byK(1L).getAs[Long]("n_nodes") == 4L)
    assert(byK(1L).getAs[Long]("n_edges") == 6L)
    assert(byK(1L).getAs[Double]("phi") == 1.0)
    // k = 6: nobody has degree > 6 -> empty club, NULL phi
    assert(byK(6L).getAs[Long]("n_nodes") == 0L)
    assert(byK(6L).isNullAt(byK(6L).schema.fieldNames.indexOf("phi")))
  }

  test("richClub: dedupes directions/self-loops; partitioning-invariant") {
    import spark.implicits._
    val raw = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("a", "b")
    val out = GraphStats.richClub(raw, "a", "b", maxK = 3).collect()
    // triangle 1-2-3: all degrees 2; k=1 club = all, phi = 1
    assert(out.find(_.getAs[Long]("k") == 1L).get
      .getAs[Double]("phi") == 1.0)
    val big = (1 to 300).map(i => ((i % 40).toLong, (i % 23).toLong))
      .toDF("a", "b")
    val p1 = GraphStats.richClub(big.coalesce(1), "a", "b", 16)
      .collect().map(_.toString).toSeq
    val p2 = GraphStats.richClub(big.repartition(11), "a", "b", 16)
      .collect().map(_.toString).toSeq
    assert(p1 == p2)
  }

  test("modularity hand-computed: triangle + pendant pair reads 0.22") {
    import spark.implicits._
    // X = {1,2,3} triangle, Y = {4,5} edge, cross edge 3-4: m = 5
    // dX = 7, dY = 3, eX = 3, eY = 1
    // Q = (3/5 − 0.49) + (1/5 − 0.09) = 0.22
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (3L, 4L))
      .toDF("a", "b")
    val labels = Seq((1L, "X"), (2L, "X"), (3L, "X"), (4L, "Y"),
      (5L, "Y")).toDF("n", "c")
    val r = GraphStats.modularity(edges.repartition(3), "a", "b",
      labels, "n", "c").head()
    assert(r.getAs[Long]("nodes") == 5L && r.getAs[Long]("edges") == 5L)
    assert(r.getAs[Long]("communities") == 2L)
    assert(math.abs(r.getAs[Double]("modularity") - 0.22) < 1e-9)
  }

  test("modularity: one community reads exactly 0; duplicate/reversed edges dedup") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L))
      .toDF("a", "b")
    val labels = Seq((1L, "Z"), (2L, "Z"), (3L, "Z")).toDF("n", "c")
    val r = GraphStats.modularity(edges, "a", "b", labels, "n", "c").head()
    // e_Z = m, d_Z = 2m → Q = 1 − 1 = 0
    assert(r.getAs[Long]("edges") == 2L)
    assert(r.getAs[Double]("modularity") == 0.0)
  }

  test("modularity refuses an unlabeled endpoint") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val labels = Seq((1L, "X")).toDF("n", "c")
    assert(intercept[IllegalArgumentException] {
      GraphStats.modularity(edges, "a", "b", labels, "n", "c")
    }.getMessage.contains("without a community"))
  }
}
