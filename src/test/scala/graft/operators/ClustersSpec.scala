package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Connected components via alternating large-star/small-star: labels
  * must equal a driver-side BFS reference on the same graph, on every
  * shape that historically breaks star-contraction code (chains, the
  * root not being an edge endpoint of every member, singletons). */
class ClustersSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** driverMax = 0 forces the distributed star loop; the default takes
    * the driver union-find path on these graph sizes. */
  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  parts: Int = 4, driverMax: Long = 1L << 20): Map[Long, Long] = {
    val n = nodes.toDF("id").repartition(parts)
    val e = edges.toDF("a", "b").repartition(parts)
    Clusters.connectedComponents(n, "id", e, "a", "b", driverMaxEdges = driverMax)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side reference: union-find. */
  private def reference(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { val p = parent(x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("two triangles joined by a bridge resolve to one cluster; min id wins") {
    val nodes = (1L to 7L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (6L, 7L), (7L, 5L), (3L, 5L), (4L, 4L))
    // self-loop (4,4) must be ignored by the operator: 4 stays a singleton
    val got = run(nodes, edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("long chain (worst-case diameter) converges and matches union-find") {
    val nodes = (0L until 64L)
    val edges = (0L until 63L).map(i => (i + 1, i)) // descending orientation
    assert(run(nodes, edges, driverMax = 0L) == reference(nodes, edges))
    assert(run(nodes, edges) == reference(nodes, edges))
  }

  test("random graph: distributed star loop == driver union-find == reference") {
    val rnd = new scala.util.Random(42)
    val nodes = (0L until 200L)
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val want = reference(nodes, edges)
    assert(run(nodes, edges, parts = 1, driverMax = 0L) == want)
    assert(run(nodes, edges, parts = 7, driverMax = 0L) == want)
    assert(run(nodes, edges, parts = 7) == want)
  }

  test("duplicate and reversed pairs don't change the answer") {
    val nodes = Seq(10L, 20L, 30L)
    val e1 = Seq((10L, 20L))
    val e2 = Seq((10L, 20L), (20L, 10L), (10L, 20L))
    assert(run(nodes, e1) == run(nodes, e2))
  }

  test("empty edge list: every node is its own singleton cluster") {
    val got = run(Seq(1L, 2L, 3L), Seq.empty)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("dropNearDuplicates keeps one doc per near-dup cluster, columns intact") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "a"),
      (2L, "alpha beta gamma delta epsilon zeta", "b"),   // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta", "c"), // near-dup of 1/2
      (4L, "totally different content about spark plans", "d"))
      .toDF("doc_id", "text", "tag")
    val out = Clusters.dropNearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    assert(out.map(_.getString(2)).toSeq == Seq("a", "d")) // payload survives
  }

  test("keepers returns exactly one representative (the min) per cluster") {
    val nodes = (1L to 6L)
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    val k = Clusters.keepers(nodes.toDF("id"), "id", edges.toDF("a", "b"), "a", "b")
      .as[Long].collect().toSet
    assert(k == Set(1L, 4L, 5L))
  }
}
