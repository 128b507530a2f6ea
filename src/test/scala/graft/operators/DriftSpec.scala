package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DriftSpec extends AnyFunSuite with SparkSuite {

  private def tv(rows: Seq[(String, String)]) = {
    import spark.implicits._
    Drift.sourceTv(rows.toDF("source", "text"), "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("a source matching the corpus mix has low TV; a divergent one is high") {
    // sources a and b identical mixes; c speaks a different vocabulary
    val rows = Seq.fill(10)(("a", "x y z")) ++ Seq.fill(10)(("b", "x y z")) ++
      Seq.fill(10)(("c", "p q r"))
    val m = tv(rows)
    // corpus = 2/3 {x,y,z}, 1/3 {p,q,r}: TV(a) = TV(b) = 1/3, TV(c) = 2/3
    assert(math.abs(m("a")._2 - 1.0 / 3.0) < 1e-9)
    assert(math.abs(m("b")._2 - 1.0 / 3.0) < 1e-9)
    assert(math.abs(m("c")._2 - 2.0 / 3.0) < 1e-9)
  }

  test("hand-computed TV with partial overlap and absent terms folded in") {
    // s1: 3×x 1×y (T1=4); s2: 1×x 3×z (T2=4); corpus: x4 y1 z3 (T=8)
    // p1 = {x:.75, y:.25}; q = {x:.5, y:.125, z:.375}
    // TV(s1) = ½(|.75−.5| + |.25−.125| + |0−.375|) = ½(.25+.125+.375) = .375
    val rows = Seq(("s1", "x x x y"), ("s2", "x z z z"))
    val m = tv(rows)
    assert(m("s1")._1 == 4L)
    assert(math.abs(m("s1")._2 - 0.375) < 1e-9)
    assert(math.abs(m("s2")._2 - 0.375) < 1e-9)
  }

  test("a source that IS the whole corpus has TV exactly 0") {
    val m = tv(Seq(("only", "a b c a"), ("only", "b c")))
    assert(m("only")._2 == 0.0)
  }

  test("partitioning-invariant (integer numerators)") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (s"s${i % 4}", s"w${i % 11} w${i % 7} w${i % 5}"))
    val a = Drift.sourceTv(rows.toDF("source", "text").coalesce(1), "text", "source")
      .orderBy("source").collect().toSeq
    val b = Drift.sourceTv(rows.toDF("source", "text").repartition(13), "text", "source")
      .orderBy("source").collect().toSeq
    assert(a == b && a.size == 4)
  }

  private def ks(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Drift.ksPerSource(rows.toDF("source", "v"), "v", "source")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  test("KS: disjoint supports give D=1; identical distributions give D=0") {
    val m = ks(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 5L), ("b", 6L), ("b", 7L), ("b", 8L)))
    assert(m("a") == ((4L, 4L, 16L, 1.0)))
    assert(m("b") == ((4L, 4L, 16L, 1.0)))
    val same = ks(Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)))
    assert(same("a")._4 == 0.0 && same("b")._4 == 0.0)
  }

  test("KS: hand-computed sup with ties across samples") {
    // a = [1,1,2] (n=3), b = [1,3] (n=2): F_a = {1:⅔, 2:1, 3:1},
    // F_b = {1:½, 2:½, 3:1} -> D = |1 − ½| = ½; numerator grid max = 3
    val m = ks(Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L), ("b", 3L)))
    assert(m("a") == ((3L, 2L, 3L, 0.5)))
    assert(m("b") == ((2L, 3L, 3L, 0.5)))
  }

  test("KS: a lone source reports NULL, not a division by zero") {
    import spark.implicits._
    val out = Drift.ksPerSource(
      Seq(("only", 1L), ("only", 2L)).toDF("source", "v"), "v", "source")
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 0L && out.head.isNullAt(4))
  }

  test("centroid drift: aligned group ~1, opposed group negative, partition-invariant") {
    import spark.implicits._
    // group a: 30 vectors near +e1; group b: 3 vectors near -e1
    val rows = (1 to 30).map(i => ("a", Array(1f, 0.001f * i))) ++
      (1 to 3).map(i => ("b", Array(-1f, 0.001f * i)))
    val df = rows.toDF("g", "vec")
    val m = Drift.centroidDrift(df, "g", "vec")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("a")._1 == 30L && m("a")._2 > 0.95)
    assert(m("b")._1 == 3L && m("b")._2 < 0.0)
    val p = Drift.centroidDrift(df.repartition(7), "g", "vec")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(p("a") == m("a")._2 && p("b") == m("b")._2) // bit-identical
  }

  test("covariance audit: dead dim, correlated pair, exact sums partition-invariant") {
    import spark.implicits._
    // dim0 = dim1 (perfectly correlated), dim2 constant (dead)
    val rows = (1 to 64).map { i =>
      val v = (i % 8).toFloat / 8f
      Tuple1(Array(v, v, 0.5f))
    }
    val df = rows.toDF("vec")
    val out = Drift.covarianceAudit(df, "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(out.size == 6) // upper triangle of 3x3
    assert(out((2, 2))._3 == 0.0, "dead dim must have zero variance")
    // var(d0) == var(d1) == cov(d0, d1) for identical dims
    assert(out((0, 0))._3 == out((0, 1))._3 && out((0, 1))._3 == out((1, 1))._3)
    assert(out((0, 0))._3 > 0.0)
    val p = Drift.covarianceAudit(df.repartition(7), "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(out.forall { case (k, v) => p(k) == v._2 }) // exact sums identical
  }

  test("KS matches brute-force EDF sup on random data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (s"s${i % 3}", rnd.nextInt(25).toLong))
    val got = Drift.ksPerSource(rows.toDF("source", "v").repartition(13), "v", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val grid = rows.map(_._2).distinct.sorted
    for (g <- Seq("s0", "s1", "s2")) {
      val xs = rows.filter(_._1 == g).map(_._2)
      val ys = rows.filterNot(_._1 == g).map(_._2)
      val num = grid.map { v =>
        math.abs(xs.count(_ <= v).toLong * ys.size - ys.count(_ <= v).toLong * xs.size)
      }.max
      assert(got(g)._1 == num, s"$g numerator")
      assert(got(g)._2 == num.toDouble / (xs.size.toLong * ys.size).toDouble)
    }
  }

  private def w1(ref: Seq[Long], cur: Seq[Long]) = {
    import spark.implicits._
    val r = Drift.wasserstein1(ref.toDF("v"), cur.toDF("v"), "v").head()
    (r.getLong(0), r.getLong(1), r.getDouble(4))
  }

  test("wasserstein1 hand-computed: half the mass moves 10 units") {
    // ref = ½δ0 + ½δ10, cur = δ10 → W1 = ½·10 = 5
    val (nr, nc, w) = w1(Seq(0L, 10L), Seq(10L))
    assert(nr == 2 && nc == 1 && w == 5.0)
  }

  test("wasserstein1 is zero on identical distributions and shift-exact") {
    assert(w1(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))._3 == 0.0)
    // whole distribution shifted by +7 → W1 = 7 regardless of shape
    assert(w1(Seq(1L, 2L, 3L), Seq(8L, 9L, 10L))._3 == 7.0)
  }

  test("wasserstein1 matches brute-force CDF integral, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ref = Seq.fill(300)(rnd.nextInt(40).toLong)
    val cur = Seq.fill(200)(rnd.nextInt(40).toLong + 5)
    val got = Drift.wasserstein1(
      ref.toDF("v").repartition(13), cur.toDF("v").repartition(7), "v")
      .head().getDouble(4)
    val grid = (ref ++ cur).distinct.sorted
    val brute = grid.zip(grid.tail).map { case (v, nx) =>
      math.abs(ref.count(_ <= v).toDouble / ref.size -
        cur.count(_ <= v).toDouble / cur.size) * (nx - v)
    }.sum
    assert(math.abs(got - brute) < 1e-6)
  }

  test("wasserstein1 fails loudly on empty input") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Drift.wasserstein1(Seq.empty[Long].toDF("v"),
        Seq.empty[Long].toDF("v"), "v")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("hellinger: identical samples 0, disjoint samples 1, known middle") {
    import spark.implicits._
    val a = Seq(1L, 1L, 2L, 2L).toDF("v")
    val same = Drift.hellinger(a, a, "v").head()
    assert(same.getAs[Double]("hellinger") == 0.0 &&
      same.getAs[Double]("bc") == 1.0)
    val disjoint = Drift.hellinger(a, Seq(9L, 9L).toDF("v"), "v").head()
    assert(disjoint.getAs[Double]("hellinger") == 1.0)
    // a = {1:2, 2:2}/4, b = {1:1, 3:1}/2 -> BC = sqrt(2*1)/sqrt(8)
    val mid = Drift.hellinger(a, Seq(1L, 3L).toDF("v"), "v").head()
    val bc = math.sqrt(2.0) / math.sqrt(8.0)
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(mid.getAs[Double]("bc") == r6(bc))
    assert(mid.getAs[Double]("hellinger") == r6(math.sqrt(1.0 - bc)))
    assert(mid.getAs[Long]("grid") == 3L)
  }

  test("hellinger is partitioning-invariant and bounds its grid") {
    import spark.implicits._
    val a = (1 to 300).map(i => (i % 40).toLong).toDF("v")
    val b = (1 to 200).map(i => (i % 55).toLong).toDF("v")
    assert(Drift.hellinger(a.coalesce(1), b.coalesce(1), "v").head().toSeq ==
      Drift.hellinger(a.repartition(7), b.repartition(5), "v").head().toSeq)
    intercept[IllegalArgumentException] {
      Drift.hellinger(spark.range(70000).toDF("v"),
        spark.range(70000).toDF("v"), "v")
    }
  }

  test("energy distance matches brute-force pairwise means, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val ref = Seq.fill(120)(rnd.nextInt(30).toLong)
    val cur = Seq.fill(80)(rnd.nextInt(30).toLong + 4)
    val r = Drift.energyDistance(ref.toDF("v").repartition(9),
      cur.toDF("v").repartition(5), "v").head()
    def mean(a: Seq[Long], b: Seq[Long]): Double =
      a.flatMap(x => b.map(y => math.abs(x - y).toDouble)).sum /
        (a.size.toDouble * b.size.toDouble)
    val (ec, er, eu) = (mean(ref, cur), mean(ref, ref), mean(cur, cur))
    assert(r.getAs[Long]("n_ref") == 120L && r.getAs[Long]("n_cur") == 80L)
    assert(math.abs(r.getAs[Double]("e_cross") - ec) < 1e-5)
    assert(math.abs(r.getAs[Double]("e_ref") - er) < 1e-5)
    assert(math.abs(r.getAs[Double]("e_cur") - eu) < 1e-5)
    assert(math.abs(r.getAs[Double]("d2") - (2 * ec - er - eu)) < 1e-5)
  }

  test("energy distance: zero on identical samples, positive on a shift") {
    import spark.implicits._
    val same = Seq(1L, 2L, 2L, 5L)
    val r0 = Drift.energyDistance(same.toDF("v"), same.toDF("v"), "v").head()
    assert(r0.getAs[Double]("d2") == 0.0 && r0.getAs[Double]("t_stat") == 0.0)
    // +7 shift past the support: E|X−Y| = 7 exactly; within-sample
    // V-statistic E|X−X'| = 8/9 each side → d2 = 14 − 16/9 = 110/9
    val r1 = Drift.energyDistance(Seq(1L, 2L, 3L).toDF("v"),
      Seq(8L, 9L, 10L).toDF("v"), "v").head()
    assert(math.abs(r1.getAs[Double]("d2") - 110.0 / 9.0) < 1e-5)
  }

  test("energy distance fails loudly on an empty side") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Drift.energyDistance(Seq(1L).toDF("v"),
        Seq.empty[Long].toDF("v"), "v")
    }
    assert(e.getMessage.contains("empty"))
  }
}
