package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the evaluation half of a search pipeline
  * (trec_eval's recall@k / MRR over (results, qrels) tables): after any
  * index build or embedding refresh, these numbers decide whether the
  * new serve path ships. Kept to rational arithmetic (hit counts,
  * 1/rank) so the scores are bit-reproducible across engines — nDCG's
  * log2 is deliberately excluded from the oracle-facing surface (libm
  * last-ulp drift breaks hash parity; a spec-side nDCG can tolerate an
  * epsilon, an oracle cannot).
  *
  * Scale shape: `results` is probes×k rows by construction (tiny);
  * `qrels` may be corpus-scale — it is touched twice, once for the
  * per-probe relevant counts (one map-side-combined agg) and once as
  * the join side marking hits (keyed (probe, doc), AQE picks broadcast
  * when results is the small side it always is). Nothing here scans
  * the corpus itself.
  */
object IrMetrics {

  /** Per-probe recall@k and MRR@k. `results` carries (probeCol, docCol,
    * rankCol) with rank starting at 1; `qrels` carries (probeCol,
    * docCol) — one row per relevant document. Probes present in qrels
    * but absent from results score 0 (never silently dropped). */
  def evaluate(results: DataFrame, qrels: DataFrame, k: Int,
               probeCol: String = "probe_id", docCol: String = "doc_id",
               rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"bad k=$k")
    val rel = qrels.select(col(probeCol), col(docCol)).withColumn("__rel", lit(1))
    val inK = results.filter(col(rankCol) <= k)
      .join(rel, Seq(probeCol, docCol), "left")
    val perProbe = inK.groupBy(col(probeCol)).agg(
      sum(coalesce(col("__rel"), lit(0))).as("__hits"),
      min(when(col("__rel") === 1, col(rankCol))).as("__frr"))
    val nRel = qrels.groupBy(col(probeCol)).agg(count(lit(1)).as("n_rel"))
    nRel.join(perProbe, Seq(probeCol), "left")
      .select(col(probeCol),
        col("n_rel"),
        coalesce(col("__hits"), lit(0L)).cast("long").as("hits"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / col("n_rel"), 6)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__frr"), lit(0.0)), 6).as("mrr"))
  }
}
