package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column by power iteration —
  * the spectral audit the embedding family (q215 covariance, q240
  * separability) closes with: the dominant eigenvector tells you WHERE
  * the variance lives (anisotropy direction — the "rogue dimension"
  * pathology of contrastive embeddings), its eigenvalue HOW MUCH (λ₁
  * vs total variance = how collapsed the space is), and the loadings
  * WHICH dimensions carry it. All-but-the-top-component removal
  * (Arora et al. 2017's common-component correction) starts from
  * exactly this vector.
  *
  * Power iteration, not full eigendecomposition: at 100 TB the
  * covariance matrix itself (dims², assembled by q215) is cheap but
  * its dense eigensolve is driver-side O(dims³) — fine at 64 dims,
  * not at 4096. The power method needs only Σ_rows (x−μ)·⟨x−μ, v⟩
  * per iteration — ONE map-side-combined dense-buffer aggregate over
  * the corpus (the q107/q33 Lloyd-update shape: the shuffle carries
  * tasks×dims doubles, never n×dims rows), `iters` passes total.
  *
  * Determinism (the k-means replay discipline, PLANS r12): cross-row
  * double sums are order-dependent in the last ulps, so every
  * iteration — and the mean — closes with a FLOAT32 cast that absorbs
  * summation-order noise; the per-row projection ⟨x−μ, v⟩ folds dims
  * in index order against float32 literals. The whole trajectory
  * replays cross-engine (q250's oracle unrolls the iterations as
  * CTEs), and the sign is FIXED by convention: the largest-|loading|
  * component is made positive (eigenvectors are sign-ambiguous;
  * conventions are how two engines agree). */
object Spectral {

  private class DVecSumAgg extends Aggregator[
      Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      val s = if (b.length == 0) new Array[Double](a.length) else b
      var i = 0; while (i < a.length) { s(i) += a(i); i += 1 }
      s
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
      if (x.length == 0) y
      else if (y.length == 0) x
      else { var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x }
    override def finish(r: Array[Double]): Seq[Double] = r.toSeq
    override def bufferEncoder = ExpressionEncoder[Array[Double]]()
    override def outputEncoder = ExpressionEncoder[Seq[Double]]()
  }

  /** Per dimension: (dim, mu, loading) + constant columns (eigval,
    * total_var, var_explained) — loadings the unit top eigenvector of
    * the covariance (float32-rounded trajectory), eigval its Rayleigh
    * quotient, var_explained = eigval/total_var. */
  def topComponent(df: DataFrame, vecCol: String, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 16, s"bad iters=$iters")
    val spark = df.sparkSession
    // Small corpora hold the vectors on the driver and run the whole
    // trajectory locally (the q155 driver-loop precedent,
    // PageRank.scala:180): at bench scale each distributed iteration is
    // plan-compile-bound — 64-literal HOF lambdas re-codegen per
    // iteration — so iters+2 jobs cost seconds over kilobytes. The
    // local loop is the identical float32-rounded arithmetic; cross-row
    // double sums land in collected order instead of partition-merge
    // order, which the per-iteration float32 casts absorb — the SAME
    // absorption the DuckDB oracle replay already relies on
    // (SpectralSpec pins driver == distributed on real corpora).
    // `spark.graft.spectral.driverLoopMaxRows` overrides (0 disables —
    // the spec hook forcing the distributed path). The probe is a
    // limit(max+1) COUNT — no vector payload leaves the executors to
    // answer "is this corpus small?" (collecting max+1 wide rows just
    // to discover the corpus is big would be a driver-memory hazard
    // the distributed-only code never had); only an under-threshold
    // corpus pays the actual collect.
    val driverLoopMax = spark.conf
      .getOption("spark.graft.spectral.driverLoopMaxRows")
      .map(_.trim.toLong).getOrElse(200000L)
    val srcVecs = df.select(col(vecCol).as("__x")).filter(col("__x").isNotNull)
    if (driverLoopMax > 0 && driverLoopMax <= Int.MaxValue - 1) {
      val bounded = srcVecs.limit(driverLoopMax.toInt + 1).count()
      if (bounded <= driverLoopMax) {
        // still bounded on the collect: a source that grew between the
        // count and the collect (re-listed files) must not flood the
        // driver — over-threshold growth falls through to distributed
        val probe = srcVecs
          .select(transform(col("__x"), x => x.cast("double")).as("__xd"))
          .limit(driverLoopMax.toInt + 1).collect()
        if (probe.length <= driverLoopMax)
          return localTopComponent(spark,
            probe.map(_.getSeq[Double](0).toArray), iters)
      }
    }
    val vsum = udaf(new DVecSumAgg)
    // iters + 2 passes over the projection input; tracked so the blocks
    // are FREED on return (Dataset.unpersist cannot release a
    // localCheckpoint — see [[Pinned]])
    val pinned = Pinned.checkpoint(srcVecs)
    val vecs = pinned.df
    try {
    // ONE pass for sums + count (dims falls out of the sum vector's
    // length) — head()/count()/mean were three separate jobs, and at
    // small SF this operator is job-compile-bound, not data-bound (r19)
    val firstRow = vecs
      .select(transform(col("__x"), x => x.cast("double")).as("__xd"))
      .agg(vsum(col("__xd")).as("s"), count(lit(1)).as("n")).head()
    val sums = firstRow.getSeq[Double](0)
    val n = firstRow.getLong(1)
    require(n >= 2, s"topComponent needs >= 2 vectors, got $n")
    val dims = sums.length
    // mean, float32-rounded (the replay cast)
    val mu: Array[Float] = sums.map(s => (s / n).toFloat).toArray
    var v: Array[Float] = Array.fill(dims)((1.0 / math.sqrt(dims.toDouble)).toFloat)
    var eigval = 0.0
    var it = 0
    while (it < iters) {
      // literal μ/v per iteration: an A/B against a broadcast 1-row
      // params frame (hoping for codegen-cache hits across iterations)
      // measured SLOWER (+0.5 s) — the HOF lambdas don't recompile per
      // literal the way plain projections do, and the extra broadcast
      // exchange per iteration is pure cost. Keep the literals.
      val muL = typedlit(mu.toSeq); val vL = typedlit(v.toSeq)
      // per-row: proj = Σ_d (x_d − μ_d)·v_d folded in index order;
      // contribution = (x − μ)·proj — one dense array per row into the
      // partial-aggregate buffer
      val centered = vecs.select(
        zip_with(col("__x"), muL,
          (x, m) => x.cast("double") - m.cast("double")).as("__c"))
      val scored = centered.select(col("__c"),
        aggregate(zip_with(col("__c"), vL, (c, w) => c * w.cast("double")),
          lit(0.0), (acc, d) => acc + d).as("__p"))
      val w = scored
        .select(transform(col("__c"), c => c * col("__p")).as("__wc"))
        .agg(vsum(col("__wc"))).head().getSeq[Double](0)
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "power iteration collapsed to the zero vector")
      v = w.map(x => (x / norm).toFloat).toArray
      eigval = (norm / n).toFloat.toDouble // ||Cv|| with unit v, float32-rounded
      it += 1
    }
    // total variance = Σ_d Var_d via the same float32-rounded pass
    val sq = vecs
      .select(zip_with(col("__x"), typedlit(mu.toSeq),
        (x, m) => { val d = x.cast("double") - m.cast("double"); d * d })
        .as("__d2"))
      .agg(vsum(col("__d2"))).head().getSeq[Double](0)
    val totalVar = (sq.sum / n).toFloat.toDouble
    assemble(spark, mu, v, eigval, totalVar)
    // the result is driver-materialized rows — the pinned projection input
    // must not outlive the call (the PageRank.scala release discipline)
    } finally pinned.release()
  }

  /** The whole trajectory on the driver — dim-indexed double loops in
    * the EXACT shape of the distributed projections: per-row proj folds
    * dims in index order against the float32 μ/v, cross-row sums
    * accumulate in collected order, every iteration (and the mean)
    * closes with the float32 replay cast. */
  private def localTopComponent(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[Array[Double]], iters: Int): DataFrame = {
    val n = rows.length.toLong
    require(n >= 2, s"topComponent needs >= 2 vectors, got $n")
    val dims = rows(0).length
    val sums = new Array[Double](dims)
    rows.foreach { x =>
      var d = 0; while (d < dims) { sums(d) += x(d); d += 1 } }
    val mu: Array[Float] = sums.map(s => (s / n).toFloat)
    var v: Array[Float] = Array.fill(dims)((1.0 / math.sqrt(dims.toDouble)).toFloat)
    var eigval = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dims)
      rows.foreach { x =>
        var proj = 0.0
        var d = 0
        while (d < dims) {
          proj += (x(d) - mu(d).toDouble) * v(d).toDouble; d += 1 }
        d = 0
        while (d < dims) { w(d) += (x(d) - mu(d).toDouble) * proj; d += 1 }
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "power iteration collapsed to the zero vector")
      v = w.map(x => (x / norm).toFloat)
      eigval = (norm / n).toFloat.toDouble
      it += 1
    }
    val sq = new Array[Double](dims)
    rows.foreach { x =>
      var d = 0
      while (d < dims) {
        val c = x(d) - mu(d).toDouble; sq(d) += c * c; d += 1 } }
    val totalVar = (sq.sum / n).toFloat.toDouble
    assemble(spark, mu, v, eigval, totalVar)
  }

  private def assemble(
      spark: org.apache.spark.sql.SparkSession, mu: Array[Float],
      v0: Array[Float], eigval: Double, totalVar: Double): DataFrame = {
    // sign convention: flip so the largest-|loading| component is positive
    var v = v0
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) v = v.map(x => -x)
    val rows = v.indices.map(i => (i, mu(i).toDouble, v(i).toDouble))
    spark.createDataFrame(rows).toDF("dim", "mu", "loading")
      .withColumn("eigval", lit(eigval))
      .withColumn("total_var", lit(totalVar))
      .withColumn("var_explained", round(lit(eigval / totalVar), 6))
      .orderBy(col("dim"))
  }
}
