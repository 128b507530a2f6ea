package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class EstimationSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("a full-probability stratum estimates its total exactly") {
    val pop = (1L to 100L).map(i => ("a", i)).toDF("g", "v")
    val est = Estimation.horvitzThompson(pop, "g", "v", Map("a" -> 10000))
      .head()
    assert(est.getLong(1) == 100L)
    assert(est.getDouble(4) == 5050.0)
  }

  test("the correction inverts the sampling fraction (hand-computed)") {
    // a 2500 bp (25%) stratum whose sample sums to 10 estimates 40
    val samp = Seq(("a", 4L), ("a", 6L)).toDF("g", "v")
    val est = Estimation.horvitzThompson(samp, "g", "v", Map("a" -> 2500)).head()
    assert(est.getLong(2) == 10L && est.getDouble(4) == 10.0 * 10000 / 2500)
  }

  test("end-to-end against the deterministic sampler: unbiased-ish per stratum") {
    val docs = t(spark, sf, "documents")
    val bps = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).map(s => s -> 2000).toMap // 20% everywhere
    val sample = Splits.stratifiedSample(docs, "doc_id", "source",
      bps.map { case (k, v) => k -> v / 10000.0 })
    val est = Estimation.horvitzThompson(sample, "source", "n_chars", bps)
    val truth = docs.groupBy("source").agg(sum(col("n_chars")).as("tt"))
    val joined = est.join(truth, "source")
      .select(col("ht_total"), col("tt").cast("double")).collect()
    // hash sampling is not exact per stratum, but the relative error of a
    // 20% sample of ~25 docs should stay inside a wide sanity band
    joined.foreach { r =>
      assert(r.getDouble(0) > 0.0)
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1) < 1.0)
    }
  }

  test("bad fractions fail loudly") {
    val samp = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Estimation.horvitzThompson(samp, "g", "v", Map("a" -> 0))
    }
    intercept[IllegalArgumentException] {
      Estimation.horvitzThompson(samp, "g", "v", Map.empty)
    }
  }
}
