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
}
