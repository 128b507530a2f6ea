package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source token-distribution drift — Total Variation distance
  * between each source's token distribution and the whole corpus's:
  * the "which feed is the odd one out" audit (a scraper that switched
  * language, a feed that started emitting boilerplate, a source whose
  * topic mix shifted between corpus versions all move their TV score;
  * run per version pair for temporal drift).
  *
  * TV(p, q) = ½ Σ_t \|p_t − q_t\| — chosen over KL/JS because it needs
  * NO logarithms: with integer counts c_st (source) and c_t (corpus),
  * totals T_s and T,
  *
  *   TV_s = [ Σ_{t∈s} \|c_st·T − c_t·T_s\| + T_s·(T − Σ_{t∈s} c_t) ] / (2·T_s·T)
  *
  * where the second term folds in every corpus term ABSENT from the
  * source (the chi2 zero-cell algebra: their contribution is exactly
  * c_t·T_s) — so nothing source×vocabulary is ever materialized. The
  * numerator and denominator are exact BIGINTs; one pinned double
  * division closes.
  *
  * Scale shape: one (source, term) map-side-combined count over the
  * corpus; the corpus count table is vocab-bounded and joins the
  * source×term table on term; outputs are one row per source. */
object Drift {

  private def toks(df: DataFrame, textCol: String) =
    explode(filter(split(col(textCol), " "), w => w =!= ""))

  /** (source, n_tokens, tv) — tv in [0, 1], 0 = identical mix. */
  def sourceTv(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val st = df.select(col(sourceCol).as("source"), toks(df, textCol).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("cst"))
    val corpus = st.groupBy(col("t")).agg(sum(col("cst")).as("ct"))
    val totals = st.groupBy(col("source")).agg(sum(col("cst")).as("ts"))
    val grandT = corpus.agg(sum(col("ct")).as("tt")) // one row
    st.join(broadcast(corpus), "t")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grandT))
      .groupBy(col("source"))
      .agg(
        first(col("ts")).as("n_tokens"),
        first(col("tt")).as("__tt"),
        sum(abs(col("cst") * col("tt") - col("ct") * col("ts"))).as("__present"),
        sum(col("ct")).as("__covered")) // Σ corpus counts of the source's terms
      .select(col("source"), col("n_tokens"),
        ((col("__present") + col("n_tokens") * (col("__tt") - col("__covered")))
          .cast("double") /
          (lit(2.0) * col("n_tokens").cast("double") * col("__tt").cast("double")))
          .as("tv"))
  }
}
