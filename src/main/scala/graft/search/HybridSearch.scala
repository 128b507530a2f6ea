package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-ranked candidate lists (lexical
  * BM25, vector cosine, ...) with Reciprocal Rank Fusion.
  *
  * RRF(d) = Σ_lists 1 / (k + rank_list(d)), summed over the lists that
  * contain d (Cormack et al., SIGIR 2009; k=60 standard). Rank-based
  * fusion needs no score calibration between lists, which is why it is
  * the default in production hybrid search engines.
  *
  * Scale shape: each input is already a top-N list (tiny — N rows per
  * probe, not corpus-sized), so the fusion is a union + one small
  * aggregation; the heavy lifting happened upstream in the rankers.
  * Determinism: 1/(k+rank) is an exact IEEE division and the
  * per-document sum has at most `lists.size` addends — with two lists
  * addition is commutative, so fused scores are bit-stable across
  * partitionings and engines. (With 3+ lists, aggregation order can
  * move the last ulp; round before bit-exact comparisons. Decimal
  * accumulation is NOT used here because engines disagree on
  * double→decimal cast rounding — measured on DuckDB 1.0 vs JVM.)
  */
object HybridSearch {

  /** Fuse ranked lists. Each input must have columns (idCol, rankCol)
    * with rank starting at 1. Output: (idCol, rrf_score, n_lists),
    * unsorted — callers order/limit. */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
          k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val contrib = lists.map(_.select(col(idCol),
      (lit(1.0) / (lit(k).cast("double") + col(rankCol).cast("double"))).as("c")))
    contrib.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("rrf_score"),
        count(lit(1)).as("n_lists"))
  }

  /** The vector leg of a hybrid query as a ranked list ready for [[rrf]],
    * under any [[VectorSearcher]] strategy (exact | ivf | hnsw) — the
    * hybrid analog of the reference's config-selected index kind. The
    * rank window runs over the already-top-N rows (≤ topN, driver-scale);
    * the corpus-scale work happens inside the searcher. */
  def vectorLeg(searcher: VectorSearcher, corpus: DataFrame,
                vecCol: String, idCol: String,
                probe: Array[Float], topN: Int): DataFrame =
    searcher.topK(corpus, vecCol, idCol, probe, topN)
      // partitionBy(id*0) = intentionally-single-partition over ≤ topN
      // rows; keeps WindowExec's empty-partition-spec warning out of the
      // bench logs so a REAL corpus-scale global window stays loud. The
      // key must be NON-foldable — EliminateWindowPartitions strips a
      // foldable lit(0) and the warning returns.
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol) * lit(0)).orderBy(col("sim").desc, col(idCol))))
      .select(col(idCol), col("rnk"))
}
