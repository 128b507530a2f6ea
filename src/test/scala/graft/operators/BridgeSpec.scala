package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the revenue bridge: a hand-walked pure-volume
  * and pure-price segment, the reconciliation identity on every row,
  * and the missing-period refusal. */
class BridgeSpec extends AnyFunSuite with SparkSuite {

  test("pure volume and pure price changes land entirely in their effect") {
    import spark.implicits._
    // A: price 10 both years, volume 100 → 150: all volume (+500)
    // B: volume 100 both years, price 10 → 12: all price (+200)
    val rows = Seq(
      ("A", 1L, 100L, 1000L), ("A", 2L, 150L, 1500L),
      ("B", 1L, 100L, 1000L), ("B", 2L, 100L, 1200L))
      .toDF("g", "p", "q", "r")
    val out = Bridge.revenueBridge(rows.repartition(3), "g", "p", "q",
      "r", 1L, 2L).collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Double]("volume_effect") == 500.0 &&
      a.getAs[Double]("price_effect") == 0.0)
    assert(b.getAs[Double]("volume_effect") == 0.0 &&
      b.getAs[Double]("price_effect") == 200.0)
    assert(a.getAs[Long]("delta_cents") == 500L &&
      b.getAs[Long]("delta_cents") == 200L)
  }

  test("effects reconcile to the exact delta on mixed changes") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    // period from the BLOCK, segment from the offset — i%2 and i%8
    // are correlated (every g0 row would land in one period)
    val rows = (1 to 200).map { i =>
      (s"g${i % 8}", ((i / 8) % 2 + 1).toLong,
        rnd.nextInt(50).toLong + 1, rnd.nextInt(100000).toLong + 1000)
    }.toDF("g", "p", "q", "r")
    val out = Bridge.revenueBridge(rows, "g", "p", "q", "r", 1L, 2L)
      .collect()
    assert(out.length == 8)
    out.foreach { r =>
      val sum = r.getAs[Double]("volume_effect") +
        r.getAs[Double]("price_effect")
      assert(math.abs(sum - r.getAs[Long]("delta_cents")) < 0.01,
        s"row $r does not reconcile")
    }
  }

  test("a segment missing a period refuses loudly") {
    import spark.implicits._
    val rows = Seq(("A", 1L, 10L, 100L), ("B", 1L, 10L, 100L),
      ("B", 2L, 10L, 100L)).toDF("g", "p", "q", "r")
    assert(intercept[IllegalArgumentException] {
      Bridge.revenueBridge(rows, "g", "p", "q", "r", 1L, 2L)
    }.getMessage.contains("without volume"))
  }
}
