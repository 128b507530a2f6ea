package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class InequalitySpec extends AnyFunSuite with SparkSuite {

  private def gini(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    Inequality.gini(rows.toDF("id", "g", "x"), "g", "x", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3))))
      .toMap
  }

  test("perfect equality gives gini (n-1 tie-rank form) at its floor") {
    // all equal values: G = (2·Σi·x − (n+1)·n·x)/(n·n·x) = (n−1)/n − ... = 0
    // rank-sum over equal x: Σ rank·x = x·n(n+1)/2 → numerator 0 exactly
    val got = gini((1L to 10L).map(i => (i, "g", 5L)))("g")
    assert(got._3.contains(0.0))
  }

  test("total concentration approaches (n-1)/n") {
    // one row holds everything: G = (n−1)/n exactly
    val rows = (1L to 9L).map(i => (i, "g", 0L)) :+ (10L, "g", 1000L)
    val got = gini(rows)("g")
    assert(got._3.exists(v => math.abs(v - 0.9) < 1e-12))
  }

  test("hand-computed gini on a small vector") {
    // x sorted = [1,2,3,4]: Σx=10, Σ rank·x = 1+4+9+16 = 30
    // G = (2·30 − 5·10)/(4·10) = 10/40 = 0.25
    val got = gini(Seq((1L, "g", 2L), (2L, "g", 4L), (3L, "g", 1L), (4L, "g", 3L)))("g")
    assert(got == ((4L, 10L, Some(0.25))))
  }

  test("all-zero group reports NULL, not a division error") {
    val got = gini(Seq((1L, "z", 0L), (2L, "z", 0L)))("z")
    assert(got._3.isEmpty)
  }

  test("groups are independent; partitioning-invariant") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, s"g${i % 3}", (i * 17) % 97))
    val a = Inequality.gini(rows.toDF("id", "g", "x").coalesce(1), "g", "x", "id")
      .orderBy("g").collect().toSeq
    val b = Inequality.gini(rows.toDF("id", "g", "x").repartition(7), "g", "x", "id")
      .orderBy("g").collect().toSeq
    assert(a == b)
    assert(a.size == 3)
  }

  test("hhi: uniform shares read 1/k, monopoly reads 1; effective_n is 1/hhi") {
    import spark.implicits._
    val uniform = (0 until 4).map(i => (s"s$i", 100L))
    val u = Inequality.hhi(uniform.toDF("g", "m"), "g", "m").head()
    assert(u.getAs[Double]("hhi") == 0.25)
    assert(u.getAs[Double]("effective_n") == 4.0)
    assert(u.getAs[Double]("share") == 0.25)
    val monopoly = Seq(("big", 997L), ("a", 1L), ("b", 1L), ("c", 1L))
    val m = Inequality.hhi(monopoly.toDF("g", "m"), "g", "m").head()
    assert(m.getAs[Double]("hhi") > 0.99)
    // hand: sum of share^2 at 6 dp
    val want = monopoly.map(_._2.toDouble / 1000).map(s => s * s).sum
    assert(m.getAs[Double]("hhi") ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("betweenGroups: identical group means read 0 on all three indices") {
    import spark.implicits._
    // same mean AND same per-member mass ratio: s_g/p_g = const → 0
    val rows = Seq(("a", 10L), ("a", 10L), ("b", 10L), ("b", 10L),
      ("b", 10L)).toDF("g", "x")
    val r = Inequality.betweenGroups(rows, "g", "x").head()
    assert(r.getAs[Double]("theil_t") == 0.0)
    assert(r.getAs[Double]("theil_l") == 0.0)
    assert(r.getAs[Double]("atkinson_1") == 0.0)
  }

  test("betweenGroups hand-computed two-group split") {
    import spark.implicits._
    // a: 1 member, mass 30; b: 3 members, mass 10 → p=(1/4,3/4),
    // sh=(3/4,1/4), mu_g=(30, 10/3), mu=10
    val rows = Seq(("a", 30L), ("b", 4L), ("b", 3L), ("b", 3L))
      .toDF("g", "x")
    val r = Inequality.betweenGroups(rows.repartition(3), "g", "x").head()
    val t = 0.75 * math.log(0.75 / 0.25) + 0.25 * math.log(0.25 / 0.75)
    val l = 0.25 * math.log(0.25 / 0.75) + 0.75 * math.log(0.75 / 0.25)
    val atk = 1.0 - math.exp(0.25 * math.log(30.0) +
      0.75 * math.log(10.0 / 3.0)) / 10.0
    assert(math.abs(r.getAs[Double]("theil_t") - t) < 1e-5)
    assert(math.abs(r.getAs[Double]("theil_l") - l) < 1e-5)
    assert(math.abs(r.getAs[Double]("atkinson_1") - atk) < 1e-5)
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L &&
      r.getAs[Long]("mass") == 40L)
  }

  test("lorenz hand-computed: 1..10 in 5 buckets") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, i)).toDF("id", "v")
    val out = Inequality.lorenz(rows.repartition(4), "v", "id", 5)
      .collect()
    assert(out.map(_.getAs[Long]("mass")).toSeq ==
      Seq(3L, 7L, 11L, 15L, 19L))
    assert(out.map(_.getAs[Long]("units")).toSeq == Seq.fill(5)(2L))
    val shares = out.map(_.getAs[Double]("cum_share")).toSeq
    assert(shares.last == 1.0)
    assert(math.abs(shares.head - 3.0 / 55.0) < 1e-6)
    assert(math.abs(shares(2) - 21.0 / 55.0) < 1e-6)
  }

  test("lorenz: uniform masses read flat deciles") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, 7L)).toDF("id", "v")
    val out = Inequality.lorenz(rows, "v", "id", 10).collect()
    assert(out.forall(_.getAs[Double]("mass_share") == 0.1))
  }

  test("betweenGroups refuses zero-mass groups and unbounded group grids") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      Inequality.betweenGroups(
        Seq(("a", 5L), ("b", 0L)).toDF("g", "x"), "g", "x")
    }.getMessage.contains("non-positive"))
    val wide = (1L to 2000L).map(i => (s"g$i", i)).toDF("g", "x")
    assert(intercept[IllegalArgumentException] {
      Inequality.betweenGroups(wide, "g", "x")
    }.getMessage.contains("outside"))
  }
}
