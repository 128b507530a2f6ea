package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the PR operating-point audit: a fully
  * hand-walked four-threshold curve (AP, best F1, the Youden tie
  * breaking toward the higher threshold), tie-group atomicity, and
  * the degenerate refusals. */
class PrCurveSpec extends AnyFunSuite with SparkSuite {

  test("hand-walked curve: AP = 5/6, best F1 = 0.8 @3, Youden tie → higher threshold") {
    import spark.implicits._
    val rows = Seq((5L, true), (4L, false), (3L, true), (2L, false))
      .toDF("s", "y")
    val r = PrCurve.operatingPoint(rows.repartition(3), "y", "s").head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("pos") == 2L)
    assert(math.abs(r.getAs[Double]("ap") - 5.0 / 6.0) < 1e-5)
    assert(r.getAs[Double]("best_f1") == 0.8)
    assert(r.getAs[Long]("best_f1_threshold") == 3L)
    // j = 0.5 at both s=5 and s=3: the tie must break HIGH
    assert(r.getAs[Double]("youden_j") == 0.5)
    assert(r.getAs[Long]("youden_threshold") == 5L)
  }

  test("tie groups are atomic: a mixed score group scores as one step") {
    import spark.implicits._
    // both s=7 rows (one +, one −) enter together: prec@7 = 0.5
    val rows = Seq((7L, true), (7L, false), (1L, true), (1L, false))
      .toDF("s", "y")
    val r = PrCurve.operatingPoint(rows, "y", "s").head()
    // thresholds 7 and 1 only; ap = (1/2)(1/2) + (1/2)(1/2) = 1/2
    assert(r.getAs[Double]("ap") == 0.5)
  }

  test("perfect separation reads AP = 1, F1 = 1, J = 1") {
    import spark.implicits._
    val rows = ((1L to 10L).map(i => (100L + i, true)) ++
      (1L to 20L).map(i => (i, false))).toDF("s", "y")
    val r = PrCurve.operatingPoint(rows, "y", "s").head()
    assert(r.getAs[Double]("ap") == 1.0)
    assert(r.getAs[Double]("best_f1") == 1.0)
    assert(r.getAs[Double]("youden_j") == 1.0)
    assert(r.getAs[Long]("best_f1_threshold") == 101L)
  }

  test("refuses one-class labels and fractional scores") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      PrCurve.operatingPoint(
        Seq((1L, true), (2L, true)).toDF("s", "y"), "y", "s")
    }.getMessage.contains("degenerate"))
    assert(intercept[IllegalArgumentException] {
      PrCurve.operatingPoint(
        Seq((1.5, true), (2.5, false)).toDF("s", "y"), "y", "s")
    }.getMessage.contains("integer"))
  }
}
