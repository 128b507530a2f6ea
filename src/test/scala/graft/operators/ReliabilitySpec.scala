package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for Cronbach's α: the hand formula on a known
  * table, the coherent-vs-incoherent contrast, the degenerate NULL,
  * and the incomplete-design guard. */
class ReliabilitySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def long(rows: Seq[(String, Double, Double, Double)]) =
    rows.zipWithIndex.flatMap { case ((_, a, b, c), i) =>
      Seq((i.toLong, "i1", a), (i.toLong, "i2", b), (i.toLong, "i3", c))
    }.toDF("subj", "item", "score")

  test("matches the hand formula on a small known table") {
    val rows = Seq(("s", 2.0, 3.0, 3.0), ("s", 4.0, 4.0, 5.0),
      ("s", 1.0, 2.0, 2.0), ("s", 5.0, 5.0, 4.0))
    val r = Reliability.cronbachAlpha(long(rows), "subj", "item", "score")
      .head()
    val items = Seq(rows.map(_._2), rows.map(_._3), rows.map(_._4))
    def popVar(v: Seq[Double]) = {
      val m = v.sum / v.length
      v.map(x => (x - m) * (x - m)).sum / v.length
    }
    val totals = rows.map(t => t._2 + t._3 + t._4)
    val want = (3.0 / 2.0) * (1.0 - items.map(popVar).sum / popVar(totals))
    assert(math.abs(r.getAs[Double]("alpha") - want) < 1e-9)
    assert(r.getAs[Long]("n_subjects") == 4L && r.getAs[Long]("k_items") == 3L)
  }

  test("coherent items score near 1; independent items score near 0") {
    // coherent: all three items are the same signal + tiny per-item shift
    val sig = (0 until 60).map(i => 10.0 + (i % 7))
    val coh = sig.map(s => ("x", s, s + 0.5, s - 0.25))
    val rc = Reliability.cronbachAlpha(long(coh), "subj", "item", "score")
      .head().getAs[Double]("alpha")
    assert(rc > 0.99, s"coherent alpha=$rc")
    // incoherent: three unrelated deterministic streams
    val inc = (0 until 60).map(i =>
      ("x", (i % 7).toDouble, (i * 3 % 11).toDouble, (i * 5 % 13).toDouble))
    val ri = Reliability.cronbachAlpha(long(inc), "subj", "item", "score")
      .head().getAs[Double]("alpha")
    assert(ri < 0.4, s"incoherent alpha=$ri")
  }

  test("zero total variance gives NULL; incomplete designs are loud") {
    val const = (0 until 5).map(_ => ("x", 1.0, 2.0, 3.0))
    assert(Reliability.cronbachAlpha(long(const), "subj", "item", "score")
      .head().isNullAt(4))
    val missing = long(Seq(("s", 1.0, 2.0, 3.0), ("s", 2.0, 3.0, 4.0)))
      .filter(!($"subj" === 1L && $"item" === "i3"))
    intercept[IllegalArgumentException] {
      Reliability.cronbachAlpha(missing, "subj", "item", "score")
    }
  }
}
