package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the attack
    * l-diversity still misses for ORDERED sensitive attributes:
    * "salary ∈ {49k, 50k, 51k}" is 3-diverse yet discloses salary to
    * ±2%. A cell is t-close when the earth-mover's distance between
    * its sensitive-value distribution and the WHOLE release's stays
    * ≤ t. For a numeric attribute this is the paper's ordered-distance
    * EMD over the m-value global domain with consecutive values one
    * ordinal step apart:
    *
    *   EMD(cell) = (1/(m−1)) · Σ_{i=1..m} |cumP_i − cumQ_i|
    *
    * (P = cell distribution, Q = global, cumulative over the sorted
    * value grid). Output: EVERY QI cell with its n and EMD plus the
    * violation flag — the reviewer reads distances, not just a list
    * (a cell at 0.99·t is information the l-diversity-style filter
    * would hide).
    *
    * Exactness: one (QI, value) census pins (the corpus pass);
    * the global grid, positions, and per-cell cumulatives all read it.
    * Each grid term is the exact integer |cumC·N − cumG·n_cell|
    * accumulated in DECIMAL(38,0) (cumC·N ≤ N² ≈ 10²⁴ at 10¹² rows —
    * the wasserstein1 overflow contract); the single closing division
    * by n_cell·N·(m−1) is the only floating point. Bit-stable on any
    * partitioning, SQL-replayable.
    *
    * Scale shape: ONE map-side-combined census; everything after runs
    * on census rows. The evaluation space is |QI cells| × m (each cell's
    * CDF must be read at every global grid position — between observed
    * cell values cumP is flat but cumQ is not), so both are loudly
    * bounded: m ≤ 2¹⁴ (integer-scaled sensitive values — pre-bucket
    * wide domains, the wasserstein1 contract) and cells ≤ 2¹⁰. */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 t: Double): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0.0 && t < 1.0, s"t must be in (0,1), got $t")
    val qi = qiCols.map(col)
    Pinned.withCheckpoint(df
      .select(qi :+ col(sensitiveCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(qi :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    ) { census =>
      val wg = Window.orderBy(col("__v"))
      val grid = census.groupBy(col("__v")).agg(sum(col("__c")).as("__g"))
        .withColumn("__cumg",
          sum(col("__g")).over(wg.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      val gstat = grid.agg(count(lit(1)).as("m"), sum(col("__g")).as("nn"))
        .head()
      val (m, nn) = (gstat.getLong(0), gstat.getLong(1))
      require(m >= 2, s"tCloseness: $m distinct sensitive values (need >= 2)")
      require(m <= (1 << 14),
        s"tCloseness: $m distinct sensitive values exceeds the 2^14 grid " +
          "bound — pre-bucket the sensitive column (floor(v/scale)) first")
      val qcells = census.groupBy(qi: _*).agg(sum(col("__c")).as("n"))
      val nCells = qcells.count()
      require(nCells <= (1 << 10),
        s"tCloseness: $nCells QI cells exceeds the 2^10 bound — " +
          "generalize the quasi-identifiers first")
      val wc = Window.partitionBy(qi: _*).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cellCum = census
        .withColumn("__cumc", sum(col("__c")).over(
          Window.partitionBy(qi: _*).orderBy(col("__v"))))
        .select(qi ++ Seq(col("__v"), col("__cumc")): _*)
      // every (QI cell × grid position); fill the cell CDF between its
      // observed values with the running max (cumC is nondecreasing)
      val full = qcells.crossJoin(broadcast(grid.select(col("__v"),
          col("__cumg"))))
        .join(cellCum, qiCols :+ "__v", "left")
        .withColumn("__cc", coalesce(max(col("__cumc")).over(wc), lit(0L)))
      val out = full.groupBy(qi :+ col("n"): _*)
        .agg(sum(abs(col("__cc").cast("decimal(38,0)") * nn -
          col("__cumg").cast("decimal(38,0)") * col("n")))
          .as("__num"))
        .withColumn("emd",
          round(col("__num").cast("double") /
            (col("n").cast("double") * nn.toDouble * (m - 1).toDouble), 6))
        .select(qi ++ Seq(col("n"), col("emd"),
          (col("emd") > t).as("violates"), lit(t).as("t_required")): _*)
        .orderBy(qi: _*)
      Grids.collectBounded(out, "tCloseness QI grid")
    }
  }
}
