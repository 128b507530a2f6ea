package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chi-square association audit between two categorical columns — the
  * "is my metadata independent?" check of a corpus audit: language vs
  * source, label vs shard, split vs domain (a high association between
  * split and topic means the train/val split leaks topic — exactly the
  * failure [[Splits.withGroupSplit]] exists to prevent, now measurable).
  * Pearson's χ² with Cramér's V effect size (Cramér, Mathematical
  * Methods of Statistics, 1946).
  *
  * Zero-cell handling without materializing the full grid: a missing
  * cell (observed 0, expected e) contributes exactly e, and Σe over ALL
  * cells is N — so χ² = N + Σ_observed((n−e)²/e − e), computed over
  * observed cells only. No cross-join of the category domains.
  *
  * Exactness: all counts are exact integers; each cell's double term is
  * cast to DECIMAL(38,12) before summation (the engine's dsum idiom —
  * decimal addition is order-independent where double addition is not),
  * so χ² is partitioning-invariant and SQL-replayable.
  *
  * Scale shape: one (a,b)-keyed map-side-combined count aggregate over
  * the corpus; everything after runs on the cells×1 grid (bounded by
  * \|A\|·\|B\|, metadata cardinality — never rows). */
object Association {

  /** One row: (n, cells, dof, chi2, cramers_v). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("nab"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("nab")).as("na"))
    val colT = cells.groupBy(col("b")).agg(sum(col("nab")).as("nb"))
    val tot = cells.agg(sum(col("nab")).as("n"),
      count(lit(1)).as("cells"),
      countDistinct(col("a")).as("r"),
      countDistinct(col("b")).as("c"))
    val joined = cells
      .join(broadcast(rowT), "a")
      .join(broadcast(colT), "b")
      .crossJoin(broadcast(tot))
    // e = na·nb/n in doubles from exact longs; per-cell term
    // (nab−e)²/e − e accumulated in decimal for order independence
    val e = col("na").cast("double") * col("nb").cast("double") / col("n").cast("double")
    val term = (col("nab").cast("double") - e) * (col("nab").cast("double") - e) / e - e
    joined
      .withColumn("__t", term.cast("decimal(38,12)"))
      .groupBy(col("n"), col("cells"), col("r"), col("c"))
      .agg(sum(col("__t")).as("__s"))
      .select(col("n"), col("cells"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        (col("n").cast("double") + col("__s").cast("double")).as("chi2"),
        when(col("r") === 1 || col("c") === 1, lit(null).cast("double"))
          .otherwise(sqrt(
            (col("n").cast("double") + col("__s").cast("double")) /
              (col("n").cast("double") *
                (least(col("r"), col("c")) - 1).cast("double"))))
          .as("cramers_v"))
  }

  /** Goodman–Kruskal λ (1954) — the PREDICTIVE association read χ²/V
    * (q174) cannot give: χ² measures departure from independence in
    * any direction; λ(a|b) answers "by what fraction does knowing b
    * reduce the error of guessing a's mode" — 0 means b never changes
    * the best guess (association without predictive value is common:
    * a significant χ² with λ = 0 is the classic misread), and λ is
    * DIRECTIONAL where V is not (λ(a|b) ≠ λ(b|a)).
    *
    *   λ(a|b) = (Σ_b max_a n_ab − max_a n_a·) / (n − max_a n_a·)
    *
    * plus the transpose and the symmetric pooled form.
    *
    * Exactness: every term is an exact BIGINT off the contingency
    * census — the one fully integer association measure in the suite;
    * the three closing divisions are the only floating point.
    *
    * Scale shape: one (a,b)-keyed map-side-combined count aggregate;
    * the maxima run on the cells grid (metadata-bounded). A modal
    * margin equal to n (single category on either axis) refuses —
    * λ's denominator is 0 there by definition. */
  def gkLambda(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__nab"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(cells) { cs =>
      val nCells = cs.count()
      require(nCells >= 1, "gkLambda: empty input")
      val byB = cs.groupBy(col("__b")).agg(max(col("__nab")).as("__m"))
        .agg(sum(col("__m")).as("__smb"))
      val byA = cs.groupBy(col("__a")).agg(max(col("__nab")).as("__m"))
        .agg(sum(col("__m")).as("__sma"))
      val margins = cs.groupBy(col("__a")).agg(sum(col("__nab")).as("__na"))
        .agg(max(col("__na")).as("__mra"), sum(col("__na")).as("__n"))
      val marginsB = cs.groupBy(col("__b")).agg(sum(col("__nab")).as("__nb"))
        .agg(max(col("__nb")).as("__mrb"))
      val r = byB.crossJoin(byA).crossJoin(margins).crossJoin(marginsB)
        .head()
      val (smb, sma, mra, n, mrb) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      require(n > mra && n > mrb,
        s"gkLambda: a modal margin equals n ($n) — λ undefined " +
          "(single-category axis)")
      val lambdaAB = (smb - mra).toDouble / (n - mra).toDouble
      val lambdaBA = (sma - mrb).toDouble / (n - mrb).toDouble
      val lambdaSym = (smb + sma - mra - mrb).toDouble /
        (2L * n - mra - mrb).toDouble
      spark.range(1).select(lit(n).as("n"), lit(nCells).as("cells"),
        lit(smb).as("sum_colmax"), lit(sma).as("sum_rowmax"),
        lit(mra).as("modal_row"), lit(mrb).as("modal_col"),
        round(lit(lambdaAB), 6).as("lambda_a_given_b"),
        round(lit(lambdaBA), 6).as("lambda_b_given_a"),
        round(lit(lambdaSym), 6).as("lambda_sym"))
    }
  }
}
