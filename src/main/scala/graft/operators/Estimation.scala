package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Horvitz–Thompson estimation from a deterministic stratified sample
  * (Horvitz & Thompson 1952) — the audit that closes the engine's
  * sampling loop: [[Splits.stratifiedSample]] draws per-stratum
  * fractions; every metric computed ON the sample then needs the
  * inverse-inclusion-probability correction to speak about the
  * CORPUS, and the uncorrected sample mean is silently biased toward
  * over-sampled strata. The estimator: per stratum with sampling
  * fraction f = bp/10000, T̂ = (Σ sample values) · 10000/bp — unbiased
  * under the hash-deterministic design for the same reason as under
  * Bernoulli (each row's inclusion probability is f on the bucket
  * grid).
  *
  * Exactness: sample sums are exact BIGINTs; each estimate is ONE
  * closing double expression (sum·10000/bp, left-assoc) — engine-
  * identical; the per-stratum rows carry the exact integer inputs so
  * the arithmetic is auditable, not just the result.
  *
  * Scale shape: one map-side-combined group aggregate over the SAMPLE
  * (the corpus appears only if the caller joins truth beside it —
  * the gate does, once, for the error column). */
object Estimation {

  /** (group, n_sample, sum_sample, bp, ht_total) per stratum present
    * in `fractionsBp` (bp = basis points, the
    * [[Splits.stratifiedSample]] grid). Strata with bp ≤ 0 are
    * rejected loudly — a zero-probability stratum cannot be estimated
    * from, only reported missing. */
  def horvitzThompson(sample: DataFrame, groupCol: String, valueCol: String,
                      fractionsBp: Map[String, Int]): DataFrame = {
    require(fractionsBp.nonEmpty, "need at least one stratum fraction")
    require(fractionsBp.values.forall(bp => bp > 0 && bp <= 10000),
      s"fractions must be in (0, 10000] bp: $fractionsBp")
    val spark = sample.sparkSession
    import spark.implicits._
    val fr = fractionsBp.toSeq.toDF(groupCol, "bp")
    sample
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sample"),
        sum(col(valueCol).cast("long")).as("sum_sample"))
      .join(broadcast(fr), groupCol)
      .withColumn("ht_total",
        col("sum_sample").cast("double") * 10000.0 / col("bp").cast("double"))
  }

  /** Chapman capture–recapture population estimate — "how big is the
    * set we can only sample": two INDEPENDENT detectors each surface a
    * subset of a population (two dedup fingerprinters, two entity
    * extractors, two crawl frontiers), and the overlap calibrates the
    * blind spot. With n₁, n₂ detected and m in both (Chapman 1951 —
    * the bias-corrected Lincoln–Petersen form, defined even at m = 0):
    *
    *   N̂  = (n₁+1)(n₂+1)/(m+1) − 1
    *   se² = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2))
    *
    * The audit use: N̂ ≫ |detected union| means the detectors share a
    * blind spot worth engineering on (e.g. near-duplicates BOTH
    * fingerprinters miss).
    *
    * Exactness: n₁, n₂, m are exact distinct counts off one
    * aggregate each; the two formulas close in doubles, 6-dp.
    *
    * Scale shape: keys project narrow, the overlap is ONE
    * co-partitioned semi-join keyed count — no row data moves. */
  def chapman(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    // each detector's distinct key set pins (counted AND joined — the
    // naive form re-derived both distincts for the overlap); released
    // before the literal-row return
    val kaPin = Pinned.checkpoint(a.select(col(keyCol).as("__k"))
      .filter(col("__k").isNotNull).distinct())
    val kbPin = Pinned.checkpoint(b.select(col(keyCol).as("__k"))
      .filter(col("__k").isNotNull).distinct())
    val (n1, n2, m) =
      try {
        (kaPin.df.count(), kbPin.df.count(),
          kaPin.df.join(kbPin.df, "__k").count())
      } finally {
        // release on EVERY exit path — a failing count (or the empty-
        // capture require below firing after a zero count) must not
        // leak the pins (ADVICE r15)
        kaPin.release(); kbPin.release()
      }
    require(n1 > 0 && n2 > 0, s"chapman: empty capture ($n1, $n2)")
    val nHat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    val se = math.sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m) /
      ((m + 1.0) * (m + 1.0) * (m + 2.0)))
    val spark = a.sparkSession
    spark.range(1).select(lit(n1).as("n1"), lit(n2).as("n2"),
      lit(m).as("overlap"), round(lit(nHat), 6).as("n_hat"),
      round(lit(se), 6).as("se"))
  }
}
