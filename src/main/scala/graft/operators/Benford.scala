package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford's-law audit of a numeric column per source — the
  * fabricated-data tripwire the profiling family (q151/q174) was
  * missing: naturally-occurring multiplicative quantities (prices,
  * populations, file sizes) put first significant digit d with
  * probability log₁₀(1 + 1/d) (Newcomb 1881, Benford 1938); a feed
  * whose digits drift from the law was truncated, synthesized, or
  * unit-mangled upstream. Per source the audit emits the 9-digit
  * observed-vs-expected table and the χ² distance — ranked, it's the
  * "which ingest partner is sending fabricated numbers" report.
  *
  * Determinism: values enter as exact DECIMAL(18,6)-scaled integers
  * (micro-units), so the first digit is INTEGER string extraction —
  * no log10-of-double in the digit path (the classic implementation
  * computes d = ⌊x/10^⌊log₁₀x⌋⌋ and inherits libm variance; integer
  * division by construction cannot disagree across engines). The nine
  * Benford probabilities are SPEC-PINNED double literals (shared with
  * the oracle), so even the expected side is engine-independent; χ²
  * folds the 9-term grid in digit order — a fixed expression tree.
  *
  * Scale shape: one map-side-combined (source, digit) count — the only
  * corpus-scale stage; the 9×sources grid closes everything else. */
object Benford {

  /** log₁₀(1 + 1/d) for d = 1..9, pinned to the shared literals. */
  val P: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** First-digit counts per source: (src, d, o) — the mergeable
    * sufficient statistic ([[graft.streaming.BenfordMonitor]] keeps a
    * ledger of these per batch; summing ledgers IS the cumulative
    * audit). Values enter at micro-unit precision: rows whose |value|
    * rounds below 1 micro-unit (or NULL) are excluded — they have no
    * first significant digit. */
  def digitCounts(df: DataFrame, sourceCol: String,
                  valueCol: String): DataFrame = {
    val micro = abs(col(valueCol).cast("decimal(18,6)") * 1000000)
      .cast("decimal(38,0)")
    df.filter(col(valueCol).isNotNull && micro >= 1)
      .select(col(sourceCol).as("src"),
        substring(micro.cast("string"), 1, 1).cast("int").as("d"))
      .groupBy(col("src"), col("d")).agg(count(lit(1)).as("o"))
  }

  /** Per (source, digit): (src, d, n, o, benford_p, obs_p, chi2) with
    * `chi2` the per-source statistic repeated on its 9 rows. */
  def firstDigitAudit(df: DataFrame, sourceCol: String,
                      valueCol: String): DataFrame =
    auditFromCounts(digitCounts(df, sourceCol, valueCol))

  /** The audit from a (src, d, o) count table — the serve face shared
    * by the batch audit and the streaming monitor's cumulative state. */
  def auditFromCounts(obs: DataFrame): DataFrame = {
    val totals = obs.groupBy(col("src")).agg(sum(col("o")).as("n"))
    val grid = totals
      .crossJoin(broadcast(
        obs.sparkSession.range(1, 10).select(col("id").cast("int").as("d"))))
      .join(obs, Seq("src", "d"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val pExpr: Column = element_at(typedlit(P), col("d"))
    // χ² = Σ_d (o_d − n·p_d)²/(n·p_d), folded per source in digit
    // order (sorted-struct fold — the q224 discipline, never an
    // order-unspecified SUM over doubles)
    val chi = grid.groupBy(col("src").as("__s"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("d"), col("o"), col("n")))),
          s => {
            val p = element_at(typedlit(P), s.getField("d"))
            val e = s.getField("n").cast("double") * p
            (s.getField("o").cast("double") - e) *
              (s.getField("o").cast("double") - e) / e
          }),
        lit(0.0), (acc, x) => acc + x).as("chi2"))
    grid.join(chi, col("src") === col("__s"))
      .select(col("src"), col("d"), col("n"), col("o"),
        round(pExpr, 6).as("benford_p"),
        round(col("o").cast("double") / col("n").cast("double"), 6).as("obs_p"),
        round(col("chi2"), 6).as("chi2"))
      .orderBy(col("src"), col("d"))
  }
}
