package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class GraphFeaturesSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  // affiliations: a->{p1,p2,p3}, b->{p2,p3}, c->{p3}, d->{p4}
  private val edges = Seq(
    (1L, 101L), (1L, 102L), (1L, 103L),
    (2L, 102L), (2L, 103L),
    (3L, 103L),
    (4L, 104L)).toDF("s", "p")

  test("hand-computed cn / aa / pa") {
    // deg(p102)=2, deg(p103)=3; pair (a,b): shared {102,103}
    // aa = 1/ln2 + 1/ln3; pa = 3*2
    val pairs = Seq((1L, 2L, 1), (1L, 4L, 0)).toDF("s1", "s2", "label")
    val out = GraphFeatures.affiliationFeatures(pairs, "s1", "s2", edges, "s", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    val (lab, cn, aa, pa) = out((1L, 2L))
    assert(lab == 1 && cn == 2L && pa == 6L)
    assert(math.abs(aa - (1.0 / math.log(2) + 1.0 / math.log(3))) < 1e-12)
    // disjoint pair: zero features, pa from degrees
    assert(out((1L, 4L)) == ((0, 0L, 0.0, 3L)))
  }

  test("degree-1 shared affiliations contribute nothing to AA (no infinities)") {
    // e and f share ONLY p200 with deg 2... construct deg-1 via self pair:
    val e2 = Seq((5L, 200L), (6L, 200L), (5L, 201L)).toDF("s", "p")
    // p201 has degree 1 and is NOT shared; p200 deg 2 shared
    val pairs = Seq((5L, 6L)).toDF("s1", "s2")
    val r = GraphFeatures.affiliationFeatures(pairs, "s1", "s2", e2, "s", "p").head()
    assert(r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - 1.0 / math.log(2)) < 1e-12)
    assert(!r.getDouble(3).isInfinite)
  }

  test("extra pair columns carry through; invariant to partitioning") {
    val pairs = (1L to 3L).flatMap(a => (1L to 4L).filter(_ > a).map(b =>
      (a, b, s"tag$a$b"))).toDF("s1", "s2", "tag")
    def run(p: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      GraphFeatures.affiliationFeatures(p, "s1", "s2", e, "s", "p")
        .orderBy("s1", "s2").collect().map(_.toSeq).toSeq
    val a = run(pairs, edges)
    assert(a.forall(_.length == 6)) // s1, s2, tag, cn, aa, pa
    assert(a == run(pairs.repartition(7), edges.repartition(5)))
  }

  test("pairs with edgeless endpoints are kept with cn=0 / aa=0 / pa=0") {
    import spark.implicits._
    // node 99 has no edges at all: the pair must survive (pairs are
    // GIVEN), with zero features — not silently vanish on a degree join
    val pairs = Seq((1L, 99L), (99L, 98L)).toDF("s1", "s2")
    val out = GraphFeatures.affiliationFeatures(pairs, "s1", "s2",
        edges, "s", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out.size == 2)
    assert(out((1L, 99L))._1 == 0L && out((1L, 99L))._2 == 0.0)
    assert(out((1L, 99L))._3 == 0L) // deg(99) = 0 -> pa = 0
    assert(out((99L, 98L)) == ((0L, 0.0, 0L)))
  }

  test("colliding column names fail loudly") {
    val pairs = Seq((1L, 2L, 9L)).toDF("s1", "s2", "cn")
    intercept[IllegalArgumentException] {
      GraphFeatures.affiliationFeatures(pairs, "s1", "s2", edges, "s", "p")
    }
  }
}
