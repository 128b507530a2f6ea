package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mix sampling: fill a per-source quota with the first `quota`
  * rows of a deterministic hash order — the training-data curation step
  * that turns corpus proportions into target proportions with a
  * reproducible draw.
  *
  * The naive plan is `row_number().over(Window.partitionBy(source)
  * .orderBy(key))` over the ENTIRE corpus: at 100 TB the largest
  * domain's full row set funnels through one task to fill a ~200-row
  * quota — the classic per-group-window scale killer. The scale path
  * here never ranks the corpus:
  *
  *  1. a narrow hash-threshold pre-filter keeps only rows whose key
  *     falls in the smallest `(4·quota + 64) / n` fraction of the key
  *     space per source (expected survivors ≈ 4·quota + 64 — a Chernoff
  *     bound puts the chance of fewer than `quota` survivors below
  *     e^-quota for the 4× margin; the +64 floor covers tiny quotas);
  *  2. the rank window runs over survivors only — thousands of rows per
  *     source, not billions;
  *  3. the promise is CHECKED, not assumed (the
  *     [[Frequency.heavyHitters]] verified-or-exact pattern): survivors
  *     are all rows with key < threshold, so if a source retains ≥ quota
  *     of them, the quota smallest keys are all survivors and their
  *     ranks are IDENTICAL to the full-corpus ranks — the fast answer is
  *     bit-exact. Any deficient source (possible only when the hash
  *     anti-concentrates or n was stale) pays the direct window instead
  *     of returning a silently short sample.
  *
  * Exactness therefore never depends on the margin — the margin only
  * sets how often the slow path runs.
  */
object DomainMix {

  private val TwoTo32 = 4294967296L

  /** Reference form: full-corpus per-source rank window. Exact by
    * construction; the scale-unsafe shape [[sampled]] is checked
    * against (and falls back to). `key` must be a deterministic
    * expression over `docs`' columns with values in [0, 2^32). */
  def direct(docs: DataFrame, quotas: DataFrame, key: Column,
             sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("shuffle_key"), col(idCol))
    docs.withColumn("shuffle_key", key)
      .withColumn("rn", row_number().over(w))
      .join(broadcast(quotas.select(col(sourceCol), col("quota"))), Seq(sourceCol))
      .filter(col("rn") <= col("quota"))
      .drop("shuffle_key", "quota")
  }

  /** Scale path: pre-filter to expected `4·quota + 64` survivors per
    * source, rank survivors, verify every source filled its quota; any
    * shortfall falls back to [[direct]]. Output is bit-identical to
    * [[direct]] on either path.
    *
    * `quotas` must carry (`sourceCol`, `quota`, `n`) where `n` is the
    * source's row count (the caller already aggregated it to compute
    * quotas — group-cardinality rows, broadcast-sized). */
  def sampled(docs: DataFrame, quotas: DataFrame, key: Column,
              sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val withThresh = quotas.withColumn("thresh",
      least(lit(TwoTo32),
        ceil(lit(TwoTo32.toDouble) * (col("quota") * 4 + 64) / col("n")).cast("long")))
    val survivors = docs.withColumn("shuffle_key", key)
      .join(broadcast(withThresh.select(col(sourceCol), col("quota"), col("thresh"))),
        Seq(sourceCol))
      .filter(col("shuffle_key") < col("thresh"))
    // Verified-or-exact: a source is sound iff it kept >= quota survivors
    // (then the quota smallest keys all survived the filter and their
    // ranks match the full ordering). One group-cardinality-sized check.
    val kept = survivors.groupBy(col(sourceCol)).agg(count(lit(1)).as("kept"))
    val deficient = withThresh.select(col(sourceCol), col("quota"))
      .join(broadcast(kept), Seq(sourceCol), "left")
      .filter(coalesce(col("kept"), lit(0L)) < col("quota"))
      .limit(1).count() > 0
    if (deficient) direct(docs, quotas, key, sourceCol, idCol)
    else {
      val w = Window.partitionBy(col(sourceCol)).orderBy(col("shuffle_key"), col(idCol))
      survivors.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("quota"))
        .drop("shuffle_key", "quota", "thresh")
    }
  }
}
