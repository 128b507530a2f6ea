package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class TrianglesSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  private def perNode(pairs: (Long, Long)*): Map[Long, Long] =
    Triangles.perNode(edges(pairs: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(Triangles.triangles(edges(k4: _*), "a", "b").count() == 4)
    assert(perNode(k4: _*) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle with a tail: tail nodes absent from per-node counts") {
    val got = perNode(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("square without diagonals has no triangles") {
    assert(perNode(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L).isEmpty)
  }

  test("duplicates, reversals, and self-loops collapse") {
    val got = perNode(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L,
      1L -> 1L, 3L -> 3L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("each triangle row is emitted once, at its lowest-ordered vertex") {
    // hub 1 connects to all; 2-3 closes one triangle. deg: 1→3, 2→2, 3→2, 4→1
    val tri = Triangles.triangles(edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // counting vertex is the LOWEST (degree, id): node 2 (deg 2) not hub 1 (deg 3)
    assert(tri == Seq((2L, 3L, 1L)))
  }

  test("orientation agrees with the brute-force canonical triple join") {
    // deterministic pseudo-random graph over 30 nodes
    val pairs = for {
      i <- 1L to 30L; j <- (i + 1) to 30L
      if (i * 31 + j * 17) % 5 == 0
    } yield (i, j)
    val e = edges(pairs: _*)
    val got = Triangles.perNode(e, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: canonical x<y<z triple join
    val ce = e.select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")).distinct()
    val t1 = ce.select(col("u").as("x"), col("v").as("y"))
    val t2 = ce.select(col("u").as("y"), col("v").as("z"))
    val t3 = ce.select(col("u").as("x"), col("v").as("z"))
    val tri = t1.join(t2, "y").join(t3, Seq("x", "z"), "left_semi")
    val brute = tri.select(col("x").as("n"))
      .union(tri.select(col("y").as("n")))
      .union(tri.select(col("z").as("n")))
      .groupBy("n").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute)
    assert(got.nonEmpty, "test graph should contain triangles")
  }

  test("result is invariant to input partitioning") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 1L, 4L -> 2L)
    val one = Triangles.perNode(edges(pairs: _*).repartition(1), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Triangles.perNode(edges(pairs: _*).repartition(7), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("maxDegree hub cap: exact count over the capped subgraph") {
    // hub 1 joins every triangle; capping it away leaves only {2,3,4}
    val pairs = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L,
      2L -> 3L, 3L -> 4L, 2L -> 4L)
    val full = Triangles.perNode(edges(pairs: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full(1L) == 3L) // hub participates in 1-2-3, 1-3-4, 1-2-4
    val capped = Triangles.perNode(edges(pairs: _*), "a", "b", maxDegree = Some(3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hub (degree 4) dropped: only the 2-3-4 triangle remains, and the
    // capped answer equals brute force on the hub-free subgraph
    assert(capped == Map(2L -> 1L, 3L -> 1L, 4L -> 1L))
    // cap above the max degree is a no-op
    val loose = Triangles.perNode(edges(pairs: _*), "a", "b", maxDegree = Some(99L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose == full)
  }

  test("autoCap: benign degree distribution derives a no-op cap (bit-exact)") {
    // near-regular graph: q99.9 degree == max degree → nothing dropped
    val pairs = for {
      i <- 1L to 30L; j <- (i + 1) to 30L
      if (i * 31 + j * 17) % 5 == 0
    } yield (i, j)
    val report = Triangles.autoCap(edges(pairs: _*), "a", "b")
    assert(report.nodesDropped == 0L && report.edgesDropped == 0L &&
      report.wedgeBoundDropped == 0L)
    val (capped, r2) = Triangles.perNodeAutoCapped(edges(pairs: _*), "a", "b")
    assert(r2.cap == report.cap)
    val exact = Triangles.perNode(edges(pairs: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == exact)
  }

  test("autoCap: heavy tail gets cut at the quantile with loud accounting") {
    // 60 low-degree nodes in a path + one hub wired to all of them:
    // hub degree 60 vs everyone else ≤ 3 — the hub IS the >q90 tail
    val path = (1L until 60L).map(i => i -> (i + 1))
    val hub = (1L to 60L).map(i => 100L -> i)
    val all = path ++ hub
    val report = Triangles.autoCap(edges(all: _*), "a", "b", quantile = 0.9)
    assert(report.cap < 60L, s"cap ${report.cap} should exclude the degree-60 hub")
    assert(report.nodesDropped == 1L)
    assert(report.edgesDropped == 60L)
    assert(report.wedgeBoundDropped == 60L * 59L / 2L)
    val (capped, _) = Triangles.perNodeAutoCapped(edges(all: _*), "a", "b", quantile = 0.9)
    // hub-free subgraph is a path: no triangles at all — and that equals
    // the exact count of the capped subgraph (exactness below the cap)
    assert(capped.count() == 0L)
    val exactBelow = Triangles.perNode(edges(path: _*), "a", "b")
    assert(exactBelow.count() == 0L)
  }

  test("clustering coefficient under a cap uses the CAPPED subgraph's degrees") {
    // hub 100 wired to a triangle {1,2,3} plus pendants; with the hub
    // capped away, node 1's degree must be its capped-subgraph degree
    // (2), not its full-graph degree (3) — coefficient 1.0, not 1/3
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L,
      100L -> 1L, 100L -> 2L, 100L -> 3L, 100L -> 4L, 100L -> 5L)
    val got = Triangles.clusteringCoefficient(edges(pairs: _*), "a", "b",
        maxDegree = Some(4L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (2L, 1L, 1.0))
    assert(got(2L) == (2L, 1L, 1.0))
    assert(got(3L) == (2L, 1L, 1.0))
    assert(!got.contains(100L)) // dropped hub has no row at all
    // and with no cap the full-graph semantics is unchanged: node 1 has
    // deg 3 and rides 3 triangles (1-2-3, 1-2-100, 1-3-100) → coef 1.0;
    // the hub (deg 5, 3 triangles) sits at 2·3/(5·4) = 0.3
    val full = Triangles.clusteringCoefficient(edges(pairs: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(full(1L) == (3L, 1.0))
    assert(full(100L) == (5L, 0.3))
  }

  test("clustering coefficient: clique 1.0, star center 0.0, hand-computed middle") {
    // K3 plus a pendant on node 3: nodes 1,2 have deg 2 and coef 1.0;
    // node 3 has deg 3, 1 triangle → 2·1/(3·2) = 1/3; pendant 4 (deg 1) absent
    val got = Triangles.clusteringCoefficient(
        edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L), "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (2L, 1L, 1.0))
    assert(got(2L) == (2L, 1L, 1.0))
    assert(got(3L)._3 == 1.0 / 3.0)
    assert(!got.contains(4L))
    // star: center's neighbors never interlink → coefficient exactly 0
    val star = Triangles.clusteringCoefficient(
        edges(1L -> 2L, 1L -> 3L, 1L -> 4L), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(star == Map(1L -> 0.0))
  }

  test("oversized node ids fail loudly, never wrap") {
    val e = edges(4294967296L -> 1L, 1L -> 2L)
    val ex = intercept[Exception] {
      Triangles.perNode(e, "a", "b").collect()
    }
    assert(ex.getMessage != null)
  }
}
