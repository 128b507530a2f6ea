package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AssociationSpec extends AnyFunSuite with SparkSuite {

  private def chi2(rows: Seq[(String, String)]) = {
    import spark.implicits._
    val r = Association.chiSquare(rows.toDF("a", "b"), "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), Option(r.get(4)).map(_ => r.getDouble(4)))
  }

  test("perfect independence gives chi2 == 0") {
    // a uniform 2×2 grid: expected == observed everywhere
    val rows = for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)
    val (n, cells, dof, c2, v) = chi2(rows)
    assert(n == 20L && cells == 4L && dof == 1L)
    assert(math.abs(c2) < 1e-9)
    assert(v.exists(_ < 1e-9))
  }

  test("perfect association gives Cramér's V == 1") {
    // a determines b completely
    val rows = Seq.fill(7)(("x", "p")) ++ Seq.fill(9)(("y", "q"))
    val (n, cells, dof, c2, v) = chi2(rows)
    assert(cells == 2L && dof == 1L)
    assert(math.abs(c2 - n) < 1e-9) // chi2 == N for a 2×2 perfect association
    assert(v.exists(x => math.abs(x - 1.0) < 1e-9))
  }

  test("hand-computed 2×2 chi-square (textbook contingency)") {
    // grid: (x,p)=10, (x,q)=20, (y,p)=30, (y,q)=40; N=100
    // e: 12, 18, 28, 42 → chi2 = 4/12 + 4/18 + 4/28 + 4/42 ≈ 0.79365...
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val (_, _, _, c2, _) = chi2(rows)
    val want = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(math.abs(c2 - want) < 1e-9)
  }

  test("zero cells contribute their expected count (no grid materialization)") {
    // 3 a-values × 2 b-values with one (a,b) combination absent
    val rows = Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(4)(("y", "p")) ++ Seq.fill(4)(("y", "q")) ++
      Seq.fill(4)(("z", "p")) // (z,q) never observed
    val (n, cells, dof, c2, _) = chi2(rows)
    assert(cells == 5L && dof == 2L) // observed cells only; dof from domains
    // brute-force chi2 over the FULL 3×2 grid including the zero cell
    val obs = Map(("x","p") -> 4.0, ("x","q") -> 4.0, ("y","p") -> 4.0,
      ("y","q") -> 4.0, ("z","p") -> 4.0, ("z","q") -> 0.0)
    val ra = Map("x" -> 8.0, "y" -> 8.0, "z" -> 4.0)
    val cb = Map("p" -> 12.0, "q" -> 8.0)
    val want = obs.map { case ((a, b), o) =>
      val e = ra(a) * cb(b) / n; (o - e) * (o - e) / e }.sum
    assert(math.abs(c2 - want) < 1e-9)
  }

  test("single-category column: dof 0, chi2 0, V null") {
    val (_, _, dof, c2, v) = chi2(Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("x", "q")))
    assert(dof == 0L && math.abs(c2) < 1e-9 && v.isEmpty)
  }

  test("partitioning-invariant (decimal term accumulation)") {
    import spark.implicits._
    val rows = (1 to 400).map(i => (s"a${i % 5}", s"b${(i * 7) % 3}"))
    val one = Association.chiSquare(rows.toDF("a", "b").coalesce(1), "a", "b")
      .collect().toSeq
    val many = Association.chiSquare(rows.toDF("a", "b").repartition(13), "a", "b")
      .collect().toSeq
    assert(one == many)
  }

  test("gk lambda: perfect prediction reads 1, mode-stable association reads 0") {
    import spark.implicits._
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val rp = Association.gkLambda(perfect, "a", "b").head()
    assert(rp.getAs[Double]("lambda_a_given_b") == 1.0)
    // b shifts cell masses but never moves a's mode: λ(a|b) = 0 while
    // the mass shift would light up a χ² — the predictive-value gap
    val stable = Seq(("x", "p"), ("x", "p"), ("y", "p"),
      ("x", "q"), ("x", "q"), ("y", "q")).toDF("a", "b")
    assert(Association.gkLambda(stable, "a", "b").head()
      .getAs[Double]("lambda_a_given_b") == 0.0)
  }

  test("gk lambda hand-computed 2x2 with asymmetric directions") {
    import spark.implicits._
    // cells: (x,p)=4, (y,p)=0, (x,q)=2, (y,q)=3 → n=9
    // λ(a|b) = (4+3−6)/(9−6) = 1/3; λ(b|a) = (4+3−5)/(9−5) = 1/2
    // λ_sym = (7+7−6−5)/(18−6−5) = 3/7
    val rows = (Seq.fill(4)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(3)(("y", "q"))).toDF("a", "b")
    val r = Association.gkLambda(rows.repartition(7), "a", "b").head()
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("cells") == 3L)
    assert(math.abs(r.getAs[Double]("lambda_a_given_b") - 1.0 / 3) < 1e-6)
    assert(r.getAs[Double]("lambda_b_given_a") == 0.5)
    assert(math.abs(r.getAs[Double]("lambda_sym") - 3.0 / 7) < 1e-6)
  }

  test("gk lambda refuses a single-category axis") {
    import spark.implicits._
    val rows = Seq(("x", "p"), ("x", "q"), ("x", "q")).toDF("a", "b")
    assert(intercept[IllegalArgumentException] {
      Association.gkLambda(rows, "a", "b")
    }.getMessage.contains("modal margin"))
  }
}
