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

  test("chapman hand-computed: known overlap") {
    import spark.implicits._
    val a = (1L to 60L).map(i => Tuple1(i)).toDF("k")
    val b = (41L to 100L).map(i => Tuple1(i)).toDF("k")
    val r = Estimation.chapman(a, b, "k").head()
    assert(r.getLong(0) == 60 && r.getLong(1) == 60 && r.getLong(2) == 20)
    val nHat = 61.0 * 61.0 / 21.0 - 1.0
    val se = math.sqrt(61.0 * 61.0 * 40.0 * 40.0 / (21.0 * 21.0 * 22.0))
    assert(math.abs(r.getDouble(3) - nHat) < 1e-6)
    assert(math.abs(r.getDouble(4) - se) < 1e-6)
  }

  test("chapman: disjoint captures still close (m = 0) and empty fails loudly") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("k"); val b = Seq(3L).toDF("k")
    val r = Estimation.chapman(a, b, "k").head()
    assert(r.getLong(2) == 0 && r.getDouble(3) == 5.0)
    intercept[IllegalArgumentException] {
      Estimation.chapman(Seq.empty[Long].toDF("k"), b, "k")
    }
  }
}
