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

  /** Observability counter: how many times the verified-or-exact check
    * found a deficient source and fell back to the direct window this
    * JVM. The scale smoke (graft.ScaleSmoke) reads it to confirm the
    * fast path's fallback rate stays ~0 as sf grows — the margin's
    * Chernoff argument, measured. Driver-side only (the check and the
    * branch both run on the driver). */
  val fallbacks = new java.util.concurrent.atomic.AtomicLong(0)

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

  /** Reference form of [[tokenBudget]]: full-corpus per-source running
    * token sum in hash order. A document is selected while the
    * cumulative token count BEFORE it is under the budget, so the
    * selection is the minimal hash-order prefix whose total reaches the
    * budget (the whole source when it cannot). This is the
    * training-mix primitive stated in tokens ("30B web + 5B code")
    * rather than document counts — budgets are token budgets.
    * `budgets` carries (`sourceCol`, `budget_tokens`). */
  def tokenBudgetDirect(docs: DataFrame, budgets: DataFrame, key: Column,
                        tokenCol: String, sourceCol: String = "source",
                        idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("shuffle_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("shuffle_key", key)
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .join(broadcast(budgets.select(col(sourceCol), col("budget_tokens"))), Seq(sourceCol))
      .filter(col("cum_before") < col("budget_tokens"))
      .drop("shuffle_key", "cum_before", "budget_tokens")
  }

  /** Scale path for token budgets — same checked pre-filter shape as
    * [[sampled]], with token mass in place of row counts: keep each
    * source's smallest `(4·budget + 4096) / total_tokens` fraction of
    * the key space (expected survivor tokens ≈ 4·budget), run the
    * cumulative-sum window over survivors only, and verify each source's
    * survivors cover its budget.
    *
    * Why the fast path is bit-exact when the check passes: survivors
    * are ALL rows with key below the threshold. Every row selected by
    * the full-order prefix must itself be a survivor — if some selected
    * row sat above the threshold, every survivor would precede it in
    * the order, and the survivors' ≥-budget token total would have
    * exhausted the budget before reaching it. And for any survivor,
    * all earlier rows in the full order are also survivors, so the
    * windowed cumulative sums agree row-for-row with [[tokenBudgetDirect]].
    * A deficient source (token mass concentrated in high keys, or a
    * stale `total_tokens`) pays the direct window instead of returning
    * a silently under-budget sample.
    *
    * `budgets` carries (`sourceCol`, `budget_tokens`, `total_tokens`);
    * the caller already aggregated totals to set budgets — one
    * group-cardinality-sized frame. A source whose total cannot cover
    * the budget keeps its whole row set (threshold caps at 2^32), which
    * is exactly what the direct form selects there. */
  def tokenBudget(docs: DataFrame, budgets: DataFrame, key: Column,
                  tokenCol: String, sourceCol: String = "source",
                  idCol: String = "doc_id"): DataFrame = {
    val withThresh = budgets.withColumn("thresh",
      least(lit(TwoTo32),
        ceil(lit(TwoTo32.toDouble) * (col("budget_tokens") * 4 + 4096) / col("total_tokens"))
          .cast("long")))
    val survivors = docs.withColumn("shuffle_key", key)
      .join(broadcast(withThresh.select(col(sourceCol), col("budget_tokens"), col("thresh"))),
        Seq(sourceCol))
      .filter(col("shuffle_key") < col("thresh"))
    // Verified-or-exact: sound iff survivors cover the budget, OR the
    // threshold kept the source whole (then survivors == the source).
    val kept = survivors.groupBy(col(sourceCol)).agg(sum(col(tokenCol)).as("kept_tokens"))
    val deficient = withThresh
      .join(broadcast(kept), Seq(sourceCol), "left")
      .filter(col("thresh") < lit(TwoTo32) &&
        coalesce(col("kept_tokens"), lit(0L)) < col("budget_tokens"))
      .limit(1).count() > 0
    if (deficient) {
      fallbacks.incrementAndGet()
      tokenBudgetDirect(docs, budgets, key, tokenCol, sourceCol, idCol)
    }
    else {
      val w = Window.partitionBy(col(sourceCol))
        .orderBy(col("shuffle_key"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      survivors.withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
        .filter(col("cum_before") < col("budget_tokens"))
        .drop("shuffle_key", "cum_before", "budget_tokens", "thresh")
    }
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
    if (deficient) {
      fallbacks.incrementAndGet()
      direct(docs, quotas, key, sourceCol, idCol)
    }
    else {
      val w = Window.partitionBy(col(sourceCol)).orderBy(col("shuffle_key"), col(idCol))
      survivors.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("quota"))
        .drop("shuffle_key", "quota", "thresh")
    }
  }

  /** Epoch-repeat schedule under a token budget — the data-constrained
    * scaling plan (Muennighoff et al. 2022, arXiv:2305.16264): when the
    * compute budget asks for more tokens than a source has, the source
    * is REPEATED, and repeated epochs are worth less than fresh ones —
    * the paper fits the decay as exponentials with half-life `rStar`
    * (≈15 repeats) and finds ~16 epochs is where marginal value hits
    * zero (`maxEpochs`).
    *
    * Per source g with unique tokens U_g: the budget splits uniformly
    * across sources (alloc = ΣU·budgetMultiple / n_sources — the
    * compute-allocation convention; weighting lives in q97/q212),
    * epochs = min(alloc/U_g, maxEpochs), repeats R = max(epochs−1, 0),
    * and the effective (fresh-equivalent) token yield is
    *
    *   D'_g = min(alloc, U_g) + U_g · rStar · (1 − e^(−R/rStar))
    *
    * — the first read counts in full (or pro-rata when the allocation
    * doesn't even cover one epoch), every repeat decays. `utilization`
    * = D'/alloc is the fraction of allocated compute that buys
    * fresh-equivalent signal; `capped` marks sources whose allocation
    * exceeded the value ceiling (the surplus should be re-allocated —
    * the audit a mixing run does before committing a schedule).
    *
    * Scale shape: one wordcount-style group aggregate + a broadcast
    * 1-row totals join; everything after is per-group closed-form
    * arithmetic (n_sources rows). All doubles close with round(6) —
    * exp ulps across engines are absorbed. */
  def repeatSchedule(docs: DataFrame, groupCol: String, tokenCount: Column,
      budgetMultiple: Double = 4.0, rStar: Double = 15.0,
      maxEpochs: Double = 16.0): DataFrame = {
    val g = docs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("unique_tokens"))
    val tot = g.agg(sum(col("unique_tokens")).as("__ut"),
      count(lit(1)).as("__ng"))
    val u = col("unique_tokens").cast("double")
    val alloc = col("__ut").cast("double") * lit(budgetMultiple) /
      col("__ng").cast("double")
    val epochsRaw = alloc / u
    val epochs = least(epochsRaw, lit(maxEpochs))
    val r = greatest(epochs - lit(1.0), lit(0.0))
    val eff = least(alloc, u) +
      u * lit(rStar) * (lit(1.0) - exp(-r / lit(rStar)))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("unique_tokens"),
        round(alloc, 6).as("alloc_tokens"),
        round(epochs, 6).as("epochs"),
        (epochsRaw > lit(maxEpochs)).as("capped"),
        round(eff, 6).as("effective_tokens"),
        round(eff / alloc, 6).as("utilization"))
  }
}
