package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class OrdinalSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("gammaSomers: textbook 2x2 contingency (C=9, D=1)") {
    // cells: (1,1)x3, (1,2)x1, (2,1)x1, (2,2)x3 — N = 8
    // C = 3·3 = 9, D = 1·1 = 1, gamma = 8/10 = 0.8
    // Tx = Ty = 6+6 = 12, P = 28, d_yx = d_xy = 8/16 = 0.5
    val rows =
      Seq.fill(3)((1L, 1L)) ++ Seq((1L, 2L)) ++
        Seq((2L, 1L)) ++ Seq.fill(3)((2L, 2L))
    val r = Ordinal.gammaSomers(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("cells") == 4L)
    assert(r.getAs[Double]("c_pairs") == 9.0)
    assert(r.getAs[Double]("d_pairs") == 1.0)
    assert(r.getAs[Double]("tied_x") == 12.0)
    assert(r.getAs[Double]("tied_y") == 12.0)
    assert(r.getAs[Double]("gamma") == 0.8)
    assert(r.getAs[Double]("somers_dyx") == 0.5)
    assert(r.getAs[Double]("somers_dxy") == 0.5)
  }

  test("gammaSomers: perfect monotone association is gamma = 1") {
    val rows = (1 to 30).map(i => (i.toLong % 5, i.toLong % 5))
    val r = Ordinal.gammaSomers(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("d_pairs") == 0.0)
    // x == y, so both Somers directions equal as well
    assert(r.getAs[Double]("somers_dyx") == r.getAs[Double]("somers_dxy"))
  }

  test("gammaSomers: reversal flips all signs; partition-invariant") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((rnd.nextInt(6).toLong, rnd.nextInt(7).toLong))
    val df = rows.toDF("x", "y")
    val fwd = Ordinal.gammaSomers(df, "x", "y").head()
    val rev = Ordinal.gammaSomers(
      df.selectExpr("x", "-y AS y"), "x", "y").head()
    assert(fwd.getAs[Double]("gamma") == -rev.getAs[Double]("gamma"))
    assert(fwd.getAs[Double]("somers_dyx") ==
      -rev.getAs[Double]("somers_dyx"))
    val a = Ordinal.gammaSomers(df.coalesce(1), "x", "y").head().toSeq
    val b = Ordinal.gammaSomers(df.repartition(13), "x", "y").head().toSeq
    assert(a == b)
  }

  test("gammaSomers refuses constant columns and unbounded grids") {
    val const = (1 to 10).map(i => (1L, i.toLong)).toDF("x", "y")
    val e = intercept[IllegalArgumentException](
      Ordinal.gammaSomers(const, "x", "y"))
    assert(e.getMessage.contains("no untied pairs"))
    val wide = spark.range(10000)
      .selectExpr("id AS x", "id * 7 AS y")
    val e2 = intercept[IllegalArgumentException](
      Ordinal.gammaSomers(wide, "x", "y"))
    assert(e2.getMessage.contains("grid exceeded"))
  }
}
