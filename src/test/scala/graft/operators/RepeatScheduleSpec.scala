package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[DomainMix.repeatSchedule]] — the data-constrained scaling audit:
  * uniform budget split, epoch cap, exponential-decay effective yield,
  * partial-read pro-rating, all against driver closed forms. */
class RepeatScheduleSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // corpus: big=1000 tokens (10 docs), mid=100 (2 docs), tiny=10 (1 doc)
  private val docs = (
    (1 to 10).map(i => (s"d$i", "big", 100L)) ++
      Seq(("m1", "mid", 60L), ("m2", "mid", 40L), ("t1", "tiny", 10L))
    ).toDF("doc_id", "source", "toks")

  private def run(mult: Double, maxE: Double = 16.0) =
    DomainMix.repeatSchedule(docs, "source", col("toks"),
        budgetMultiple = mult, maxEpochs = maxE)
      .collect().map(r => r.getAs[String]("source") -> r).toMap

  test("uniform allocation, epochs, and decayed yield match closed form") {
    // ΣU = 1110, mult 4 → alloc = 1110*4/3 = 1480 per source
    val out = run(4.0)
    val alloc = 1110.0 * 4.0 / 3.0
    assert(out("big").getAs[Double]("alloc_tokens") ==
      math.rint(alloc * 1e6) / 1e6)
    // big: epochs = 1480/1000 = 1.48, R = .48
    val eBig = alloc / 1000.0
    val effBig = 1000.0 + 1000.0 * 15.0 * (1.0 - math.exp(-(eBig - 1.0) / 15.0))
    assert(out("big").getAs[Double]("effective_tokens") ==
      math.rint(effBig * 1e6) / 1e6)
    assert(!out("big").getAs[Boolean]("capped"))
    // tiny: 1480/10 = 148 epochs raw → capped at 16
    assert(out("tiny").getAs[Boolean]("capped"))
    assert(out("tiny").getAs[Double]("epochs") == 16.0)
    val effTiny = 10.0 + 10.0 * 15.0 * (1.0 - math.exp(-15.0 / 15.0))
    assert(out("tiny").getAs[Double]("effective_tokens") ==
      math.rint(effTiny * 1e6) / 1e6)
    // utilization < 1 whenever anything repeats, and tiny's is worst
    assert(out("big").getAs[Double]("utilization") < 1.0)
    assert(out("tiny").getAs[Double]("utilization") <
      out("mid").getAs[Double]("utilization"))
  }

  test("partial read: alloc below one epoch pro-rates, zero decay") {
    // mult 0.5 → alloc = 185; big reads 185 of 1000 tokens, R=0
    val out = run(0.5)
    val alloc = 1110.0 * 0.5 / 3.0
    assert(out("big").getAs[Double]("effective_tokens") ==
      math.rint(alloc * 1e6) / 1e6)
    assert(out("big").getAs[Double]("utilization") == 1.0)
  }

  test("real corpus: one row per source, utilization in (0, 1]") {
    val out = DomainMix.repeatSchedule(
      graft.Tables.t(spark, sf, "documents"), "source",
      size(graft.functions.TextFunctions.words(col("text"))).cast("long"))
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      val u = r.getAs[Double]("utilization")
      assert(u > 0.0 && u <= 1.0, r.getAs[String]("source"))
    }
  }
}
