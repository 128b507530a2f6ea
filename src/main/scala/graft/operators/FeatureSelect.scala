package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mutual-information feature selection over a token corpus — which
  * terms carry signal about a document label (MI of the term-presence /
  * label-value indicator pair; Manning & Schütze 1999 §13.5.1, the
  * feature-selection half of what q174's χ² tests). The curation uses:
  * pick the vocabulary for a cheap n-gram classifier (lang-id, quality
  * tiers), rank leakage candidates (a term with near-total MI against a
  * benchmark-membership label IS the contamination), and audit a split
  * (no term should be highly informative of train-vs-test).
  *
  * Sufficient statistics are exact integers — the 2×2 presence/label
  * table per term (n11, n10, n01, n00) derived from df, n_label, N by
  * the q174 "derive totals from cells" discipline. The MI itself
  *
  *   MI = Σ_cells (n_ij/N) · ln(N·n_ij / (n_i·n_j)),  0·ln0 = 0
  *
  * is one fixed four-term expression tree per term — each IEEE op
  * correctly rounded, no cross-row float accumulation anywhere, so the
  * double replays cross-engine (rounded to 6 dp at the gate).
  *
  * Scale shape: one distinct-(doc, term) projection + one term-keyed
  * count (the wordcount shuffle — the corpus-scale stage), one bounded
  * label aggregate broadcast into the closing projection. `topN` bounds
  * the output by document frequency (deterministic (df desc, term)
  * order), NOT by MI — df ranking needs no second pass, and rare terms
  * (where the MI estimate is noise) are what it drops. */
object FeatureSelect {

  /** Per term: (term, df, n11, mi) for the `topN` terms by document
    * frequency. `labelCol` must be boolean-castable; NULL-label docs
    * are excluded from N and all counts. */
  def mutualInfo(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, topN: Int = 200): DataFrame = {
    require(topN >= 1, s"bad topN=$topN")
    val lab = docs.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).cast("boolean").as("__y"))
    val tot = lab.agg(count(lit(1)).as("__n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("__ny"))
    val toks = KeywordRank.tokens(docs, idCol, textCol)
      .select(col(idCol), col("term")).distinct()
    val tf = toks.join(lab, idCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n11"))
      .orderBy(col("df").desc, col("term")).limit(topN)
    def cell(nij: Column, ni: Column, nj: Column, n: Column): Column =
      when(nij > 0,
        (nij.cast("double") / n.cast("double")) *
          log(nij.cast("double") * n.cast("double") /
            (ni.cast("double") * nj.cast("double"))))
        .otherwise(lit(0.0))
    val n = col("__n"); val ny = col("__ny")
    val n10 = col("df") - col("n11")
    val n01 = ny - col("n11")
    val n00 = n - col("df") - ny + col("n11")
    tf.crossJoin(broadcast(tot))
      .select(col("term"), col("df"), col("n11"),
        round(cell(col("n11"), col("df"), ny, n) +
          cell(n10, col("df"), n - ny, n) +
          cell(n01, n - col("df"), ny, n) +
          cell(n00, n - col("df"), n - ny, n), 6).as("mi"))
      .orderBy(col("term"))
  }
}
