package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** Matryoshka (nested-prefix) embedding truncation audit — MRL
  * embeddings (Kusupati et al., "Matryoshka Representation Learning",
  * NeurIPS 2022; the "dimensions" parameter modern embedding APIs
  * expose) promise that a PREFIX of the vector is itself a usable
  * embedding. Whether a given corpus's vectors actually deliver that
  * is an empirical question per budget — and the answer decides the
  * serving memory/recall trade (a 16-of-64 prefix is a 4× smaller
  * index). This audit answers it with the engine's own exact search:
  * for each budget b, the exact top-k under PREFIX-b cosine, labeled
  * with each hit's full-dimension similarity and whether it appears
  * in the full-dimension top-k — recall@k per budget reads directly
  * off the flag column.
  *
  * Scale shape: one narrow scan per budget (slice + codegen cosine
  * into a TakeOrderedAndProject k-heap — budgets×scans, each the q30
  * cost); the flag join runs on k-row tables. Determinism: both
  * orderings tie-break by id (the exactTopK contract), so the audit
  * replays hash-identically. */
object Matryoshka {

  /** (budget, rn, idCol, trunc_sim, full_sim, in_full_topk) — one row
    * per budget per rank 1..k. */
  def truncationAudit(df: DataFrame, vecCol: String, idCol: String,
                      probe: Array[Float], k: Int,
                      budgets: Seq[Int]): DataFrame = {
    require(budgets.nonEmpty, "need at least one budget")
    require(budgets.forall(b => b >= 1 && b <= probe.length),
      s"budgets must be within the probe's ${probe.length} dims")
    val full = VectorSearch.exactTopK(df, vecCol, idCol, probe, k)
      .select(col(idCol), lit(1).as("__inf"))
    val perBudget = budgets.map { b =>
      // the corpus-scale stage is exactTopK's TakeOrderedAndProject
      // k-heap (a per-budget window over constant `budget` would be a
      // one-partition funnel); the rank window below runs on k rows
      val topk = VectorSearch.exactTopK(
        df.select(col(idCol), col(vecCol),
          slice(col(vecCol), 1, b).as("__sl")),
        "__sl", idCol, probe.take(b), k)
      val w = Window.orderBy(col("sim").desc, col(idCol))
      topk
        .withColumn("budget", lit(b))
        .withColumn("trunc_sim", col("sim"))
        .withColumn("full_sim", cosine_sim(col(vecCol), typedlit(probe)))
        .withColumn("rn", row_number().over(w))
    }.reduce(_ unionByName _)
    perBudget.join(full, Seq(idCol), "left")
      .select(col("budget"), col("rn"), col(idCol),
        col("trunc_sim"), col("full_sim"),
        (col("__inf").isNotNull).as("in_full_topk"))
  }
}
