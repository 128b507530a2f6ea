package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the power-iteration top component: recovery
  * of a planted dominant direction, unit norm + sign convention,
  * eigval/total_var sanity, determinism across partition layouts, and
  * the degenerate-input guards. */
class SpectralSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Synthetic corpus: variance 25 along a planted unit direction in
    * dims 0/1, variance ~0.01 elsewhere — λ₁ ≈ 25 dominates. */
  private def planted(n: Int, dims: Int): Seq[Seq[Float]] = {
    val dir = Array.tabulate(dims)(d =>
      if (d == 0) 0.8 else if (d == 1) 0.6 else 0.0)
    (0 until n).map { i =>
      val t = 5.0 * math.sin(i * 2.399963) // mean ~0, sd ~3.5
      val noise = (d: Int) => 0.1 * math.sin(i * 0.7 + d * 1.3)
      Seq.tabulate(dims)(d => (t * dir(d) + noise(d)).toFloat)
    }
  }

  test("recovers a planted dominant direction with its variance share") {
    val df = planted(400, 8).map(Tuple1(_)).toDF("embedding")
    val out = Spectral.topComponent(df, "embedding", iters = 6).collect()
    val v = out.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    assert(math.abs(math.abs(v(0)) - 0.8) < 0.05, v.take(3).toSeq)
    assert(math.abs(math.abs(v(1)) - 0.6) < 0.05)
    assert(v.drop(2).forall(x => math.abs(x) < 0.1))
    // unit norm and positive pivot (sign convention)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
    assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
    val r = out.head
    assert(r.getAs[Double]("eigval") > 0.8 * r.getAs[Double]("total_var"))
    assert(r.getAs[Double]("eigval") <= r.getAs[Double]("total_var") + 1e-9)
  }

  test("deterministic across partition layouts (the float32-cast discipline)") {
    val e = graft.Tables.t(spark, sf, "embeddings").select($"embedding")
    val a = Spectral.topComponent(e.repartition(3), "embedding")
      .collect().map(_.toString).toSeq
    val b = Spectral.topComponent(e.repartition(11, $"embedding"), "embedding")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("driver loop == distributed path, bit for bit (real + planted corpora)") {
    // The driver-resident loop (plan-compile-bound small corpora) must
    // reproduce the distributed trajectory exactly — the float32 replay
    // casts absorb the collected-order vs partition-merge-order double
    // sums, the same absorption the DuckDB oracle replay relies on.
    val key = "spark.graft.spectral.driverLoopMaxRows"
    val e = graft.Tables.t(spark, sf, "embeddings").select($"embedding")
    val p = planted(400, 8).map(Tuple1(_)).toDF("embedding").repartition(7)
    for (df <- Seq(e, p)) {
      spark.conf.unset(key) // default: driver loop engages (corpus is tiny)
      val local = Spectral.topComponent(df, "embedding", iters = 5)
        .collect().map(_.toString).toSeq
      spark.conf.set(key, "0") // spec hook: force the distributed path
      try {
        val dist = Spectral.topComponent(df, "embedding", iters = 5)
          .collect().map(_.toString).toSeq
        assert(local == dist)
      } finally spark.conf.unset(key)
    }
  }

  test("over-threshold corpora take the distributed path (bounded probe)") {
    val key = "spark.graft.spectral.driverLoopMaxRows"
    val df = planted(400, 8).map(Tuple1(_)).toDF("embedding")
    spark.conf.set(key, "100") // 400 rows > 100: probe must fall through
    try {
      val out = Spectral.topComponent(df, "embedding", iters = 4).collect()
      assert(out.length == 8) // still the full per-dim result
      val small = planted(90, 8).map(Tuple1(_)).toDF("embedding")
      val a = Spectral.topComponent(small, "embedding").collect()
        .map(_.toString).toSeq
      spark.conf.unset(key)
      val b = Spectral.topComponent(small, "embedding").collect()
        .map(_.toString).toSeq
      assert(a == b) // under-threshold at 100 == default-threshold result
    } finally spark.conf.unset(key)
  }

  test("guards: tiny corpora and bad iteration counts fail loudly") {
    val one = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("embedding")
    intercept[IllegalArgumentException] {
      Spectral.topComponent(one, "embedding")
    }
    val two = Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(2.0f, 1.0f)))
      .toDF("embedding")
    intercept[IllegalArgumentException] {
      Spectral.topComponent(two, "embedding", iters = 0)
    }
  }
}
