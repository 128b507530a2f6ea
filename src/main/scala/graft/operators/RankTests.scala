package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann–Whitney rank-sum / ROC-AUC per group — the standard
  * label-separability check for a ranking signal (Mann & Whitney 1947;
  * AUC = U/(n₁·n₂) is its probabilistic reading: P(score⁺ > score⁻)
  * with ties at ½). A corpus curator runs this to validate that a
  * cheap score (length, LM surprisal, quality heuristic) actually
  * separates a labeled slice before using it as a filter — AUC ≈ 0.5
  * means the signal is noise for that group.
  *
  * Exactness (the Gini/KS idiom — no floating-point ranks): with min
  * ranks r(v) from RANK() and tie counts t(v), the tie-averaged rank of
  * a row at value v is r(v) + (t(v)−1)/2, so TWICE the positive-class
  * rank sum is the exact BIGINT
  *
  *   2·R₁ = Σ_{pos rows} (2·r(v) + t(v) − 1),   2·U₁ = 2·R₁ − n₁·(n₁+1)
  *
  * and AUC = 2·U₁ / (2·n₁·n₂) closes with one pinned double division
  * (NULL when a group has only one class). Bit-stable on any
  * partitioning, SQL-replayable.
  *
  * Scale shape: ONE `Exchange(group)` + per-partition sort feeds both
  * windows (same ordering), then a map-side-combined aggregate emits
  * one row per group. Groups must be plural-per-corpus (source, lang)
  * — a single global group would funnel one partition (the q86/q167
  * caveat; pre-shard and merge U statistics if you need corpus-global).
  */
object RankTests {

  /** Operating-point selection: per group, the DEEPEST score-ranked
    * prefix whose precision against a (weak) label stays ≥
    * pNum/pDen — "pick the quality-score cutoff that keeps 90%
    * precision, and tell me how much data that keeps". Exact rational
    * test (cum_pos·pDen ≥ rank·pNum — no float on the decision), rank
    * ordering deterministic via (score desc, id), one Exchange(group)
    * window + one aggregate. The operating point is RANK-based:
    * tied scores can split at the boundary, which is the standard
    * top-k selection semantics (document the tie id-ordering).
    * Groups with no feasible prefix report NULLs. */
  def precisionThreshold(df: DataFrame, groupCol: String, scoreCol: String,
                         label: Column, idCol: String,
                         pNum: Long, pDen: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same NULL-score exclusion as aucPerGroup
    df.filter(col(scoreCol).isNotNull)
      .withColumn("__pos", label)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cp", sum(when(col("__pos"), 1L).otherwise(0L)).over(wc))
      .groupBy(col(groupCol))
      .agg(max(when(col("__cp") * pDen >= col("__rn") * pNum,
        struct(col("__rn"), col(scoreCol).as("__s"), col("__cp")))).as("__best"))
      .select(col(groupCol),
        col("__best.__rn").as("best_rank"),
        col("__best.__s").as("thr_score"),
        col("__best.__cp").as("n_pos_kept"),
        (col("__best.__cp").cast("double") / col("__best.__rn").cast("double"))
          .as("prec"))
  }

  /** (groupCol, n_pos, n_neg, u2 = 2·U₁, auc) — `labelCol` must be a
    * boolean Column (the positive class). */
  def aucPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                  label: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    val wv = Window.partitionBy(col(groupCol), col(scoreCol))
    // NULL scores cannot be ranked and engines disagree on NULL sort
    // order: excluded by definition
    df.filter(col(scoreCol).isNotNull)
      .withColumn("__pos", label)
      .withColumn("__rk", rank().over(w).cast("long"))
      .withColumn("__tie", count(lit(1)).over(wv))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col("__pos"), lit(2L) * col("__rk") + col("__tie") - 1L)
          .otherwise(0L)).as("__r2"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("__n"))
      .withColumn("n_neg", col("__n") - col("n_pos"))
      .withColumn("u2", col("__r2") - col("n_pos") * (col("n_pos") + 1))
      .withColumn("auc",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .drop("__r2", "__n")
  }
}
