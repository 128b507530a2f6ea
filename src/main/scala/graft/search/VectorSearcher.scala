package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strategy seam for the k-NN serve paths (the RAG retrieval in
  * [[graft.rag.ChatEngine]], the vector leg of [[HybridSearch]]) — the
  * engine analog of the reference's config-selected index kind
  * (appsettings.json:24, consumed at MongoDbService.cs:82: kinds
  * `vector-ivf` | `vector-hnsw`).
  *
  * Contract: `topK` returns the corpus row columns plus `sim` (double
  * cosine similarity), the top `k` rows ordered by (sim desc, id asc).
  * [[ExactSearcher]] scans the corpus it is handed; the ANN searchers
  * serve from their prebuilt index and honor the same output contract,
  * so callers swap strategies without touching their plans. At corpus
  * scale the serve path MUST be one of the index-backed strategies —
  * exact scan is the correctness baseline and the small-corpus default.
  */
trait VectorSearcher extends Serializable {
  def topK(corpus: DataFrame, vecCol: String, idCol: String,
           probe: Array[Float], k: Int): DataFrame
}

/** Brute-force scan — always exact, reads the whole corpus once. */
object ExactSearcher extends VectorSearcher {
  override def topK(corpus: DataFrame, vecCol: String, idCol: String,
                    probe: Array[Float], k: Int): DataFrame =
    VectorSearch.exactTopK(corpus, vecCol, idCol, probe, k)
}

/** Serves from a persisted [[IvfStore]]: only the `nprobe` nearest
  * centroid partitions are read (manifest pruning). The store already
  * holds the full corpus rows, so no payload join is needed; `corpus`
  * is ignored by design — the index IS the serving copy. */
final class IvfSearcher(ivf: IvfStore, nprobe: Int = 4) extends VectorSearcher {
  override def topK(corpus: DataFrame, vecCol: String, idCol: String,
                    probe: Array[Float], k: Int): DataFrame =
    ivf.search(probe, k, nprobe).drop("centroid_id")
}

/** Serves from prebuilt [[HnswIndex]] segment graphs. The graphs store
  * only (id, vector); payload columns come from a broadcast join of the
  * k hits back into the corpus. Ids must be castable to long (the same
  * requirement [[HnswIndex.build]] imposes). */
final class HnswSearcher(graphs: DataFrame, ef: Int = 64) extends VectorSearcher {
  override def topK(corpus: DataFrame, vecCol: String, idCol: String,
                    probe: Array[Float], k: Int): DataFrame = {
    val hits = HnswIndex.search(graphs, probe, k, ef)
      .withColumnRenamed("vec_id", "__hnsw_id")
    corpus
      .join(broadcast(hits), col(idCol).cast("long") === col("__hnsw_id"))
      .drop("__hnsw_id")
      .orderBy(col("sim").desc, col(idCol))
  }
}
