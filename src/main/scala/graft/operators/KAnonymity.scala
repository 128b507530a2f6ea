package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) — the release-gate privacy check
  * beside the PII family (q87/q221/q227 find DIRECT identifiers; this
  * measures QUASI-identifier risk): a row is k-anonymous when at least
  * k rows share its full quasi-identifier combination, so no released
  * record narrows an individual below a crowd of k. The audit both
  * summarizes (how many rows sit in sub-k crowds, per crowd size) and
  * pinpoints (which QI combinations violate), which is what a release
  * reviewer actually actions — generalize or drop exactly those cells.
  *
  * All counting is exact integers over one (QI-tuple) aggregate; NULL
  * QI values group as the sentinel class (SQL GROUP BY semantics —
  * NULL is itself an identifying signature, so it must not escape the
  * audit).
  *
  * Scale shape: ONE map-side-combined groupBy over the QI columns (the
  * release scan the manifest pass already prices); the violation table
  * is bounded by sub-k cell count; the histogram by distinct crowd
  * sizes below k. */
object KAnonymity {

  /** Sub-k QI cells: (qi columns..., n) for every combination with
    * fewer than k rows — the actionable violation list. */
  def violations(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** One-row release summary: (n_rows, n_cells, n_violating_cells,
    * n_rows_at_risk, min_cell, k_anonymity) — `k_anonymity` is the
    * realized k (the smallest crowd size), the number a release states. */
  def summary(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_cells"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating_cells"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("__n")).as("min_cell"))
      .withColumn("k_anonymity", col("min_cell"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the attack
    * k-anonymity alone misses: a crowd of k is worthless when all k
    * share the SAME sensitive value (homogeneity: "those 50 rows are
    * indistinguishable — and every one has diagnosis X"). Per QI cell:
    * distinct sensitive values (distinct l-diversity) and the entropy
    * form exp(H) (effective number of sensitive values — robust to a
    * 49-to-1 skew that distinct-counting calls diverse). A cell
    * violates at < l distinct values; `entropy_l` reports how much
    * weaker the skew-aware guarantee is.
    *
    * Exactness: the (QI, sensitive) census is one exact BIGINT
    * aggregate; per-cell entropy folds the census in sensitive-value
    * order (the q279 discipline); exp/ln close in doubles, 6-dp. NULL
    * sensitive values are their own class (they leak like any other).
    *
    * Scale shape: ONE map-side-combined census; per-cell folds run on
    * census rows. Output is the VIOLATION list (< l) — bounded by the
    * release reviewer's own action list, like [[violations]]. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    val census = df
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    census
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c")).as("n"),
        count(lit(1)).as("l_distinct"),
        aggregate(
          transform(array_sort(collect_list(struct(col(sensitiveCol),
            col("__c")))),
            p => {
              val c = p.getField("__c").cast("double")
              -(c) * log(c)
            }),
          lit(0.0), (acc, x) => acc + x).as("__hn"))
      // H = ln(n) + (Σ −c·ln c)/n ; entropy-l = exp(H)
      .withColumn("entropy_l",
        round(exp(log(col("n").cast("double")) +
          col("__hn") / col("n").cast("double")), 6))
      .filter(col("l_distinct") < l)
      .select(qiCols.map(col) ++ Seq(col("n"), col("l_distinct"),
        col("entropy_l"), lit(l).as("l_required")): _*)
      .orderBy(qiCols.map(col): _*)
  }
}
