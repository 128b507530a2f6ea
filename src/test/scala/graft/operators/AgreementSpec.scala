package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AgreementSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed kappa: 3 items x 2 raters, mixed agreement") {
    // A: (x,x)  B: (x,y)  C: (y,y) -> S=10, N=3, n=2, T=18
    // Pbar=(10-6)/6=2/3, Pe=18/36=1/2, kappa=(2/3-1/2)/(1/2)=1/3
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "x"), ("B", 1, "y"),
      ("C", 0, "y"), ("C", 1, "y")).toDF("item", "rater", "label")
    val r = Agreement.fleissKappa(df, "item", "rater", "label").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 10L && r.getLong(4) == 18L)
    assert(math.abs(r.getDouble(5) - 1.0 / 3.0) < 1e-12)
  }

  test("perfect agreement with plural categories gives kappa 1") {
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "y"), ("B", 1, "y"))
      .toDF("item", "rater", "label")
    assert(Agreement.fleissKappa(df, "item", "rater", "label").head().getDouble(5) == 1.0)
  }

  test("degenerate single-category design yields NULL, not 1") {
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "x"), ("B", 1, "x"))
      .toDF("item", "rater", "label")
    assert(Agreement.fleissKappa(df, "item", "rater", "label").head().isNullAt(5))
  }

  test("incomplete design fails loudly") {
    val df = Seq(("A", 0, "x"), ("A", 1, "x"), ("B", 0, "x"))
      .toDF("item", "rater", "label")
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(df, "item", "rater", "label")
    }
    assert(e.getMessage.contains("complete design"))
  }

  test("duplicate (item, rater) rows fail loudly") {
    val df = Seq(("A", 0, "x"), ("A", 0, "y"), ("B", 0, "x"), ("B", 1, "x"))
      .toDF("item", "rater", "label")
    intercept[IllegalArgumentException] {
      Agreement.fleissKappa(df, "item", "rater", "label")
    }
  }

  test("kappa is invariant to input partitioning") {
    val rows = (1 to 50).flatMap(i => (0 to 2).map(r =>
      (s"i$i", r, if ((i * 3 + r) % 7 < 2) "b" else "a")))
    val df = rows.toDF("item", "rater", "label")
    val a = Agreement.fleissKappa(df, "item", "rater", "label").head().getDouble(5)
    val b = Agreement.fleissKappa(df.repartition(13), "item", "rater", "label")
      .head().getDouble(5)
    assert(a == b)
  }
}
