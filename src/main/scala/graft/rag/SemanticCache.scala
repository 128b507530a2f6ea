package graft.rag

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search.VectorSearch

/** Semantic answer cache for the RAG serving path — the
  * embedding-similarity memo a chat assistant consults BEFORE paying
  * for retrieval + completion (the reference pays Azure OpenAI for
  * every turn, Search/Services/ChatService.cs:127-151; a semantic
  * cache is the standard production mitigation): an incoming question
  * whose nearest previously-answered question clears a similarity
  * threshold is served that stored answer; misses are answered the
  * expensive way and ADMITTED so the next paraphrase hits.
  *
  * Exact top-1 serving, not ANN: a cache lookup is a small-batch probe
  * against the cached-question corpus, exactly
  * [[VectorSearch.knnJoinAgg]]'s shape (probe batch broadcast, one
  * bounded-heap pass over the cache, no corpus shuffle) — at the scale
  * where the cache itself outgrows that, the IVF/HNSW serving path
  * (q98/q82) drops in, trading the exactness gate for recall.
  *
  * Determinism: ties resolve (sim desc, cache id asc) through the
  * shared knn machinery; `hit` compares the UNROUNDED cosine to the
  * threshold — both engines compute the identical double, so the
  * verdict is exact (gates publish sims on the 2^-20 grid, the q60
  * convention). */
object SemanticCache {

  /** One lookup pass: per probe, the nearest cached entry, its cosine,
    * and the serve verdict. Output: (probe_id, served_id, sim, hit).
    * Probes with NO cache candidates (an empty or freshly bootstrapped
    * cache) come back as misses with a null served_id/sim — the inner
    * knn aggregate alone would silently drop them, which in the
    * streaming form means an empty cache never admits and never
    * bootstraps. */
  def lookup(probes: DataFrame, probeIdCol: String, probeVecCol: String,
      cache: DataFrame, cacheIdCol: String, cacheVecCol: String,
      threshold: Double): DataFrame = {
    val nearest = VectorSearch.knnJoinAgg(probes, probeIdCol, probeVecCol,
        cache, cacheIdCol, cacheVecCol, k = 1)
      .select(col("probe_id"),
        col(cacheIdCol).as("served_id"),
        col("sim"),
        (col("sim") >= threshold).as("hit"))
    probes.select(col(probeIdCol).as("probe_id"))
      .join(nearest, Seq("probe_id"), "left")
      .select(col("probe_id"), col("served_id"), col("sim"),
        coalesce(col("hit"), lit(false)).as("hit"))
  }

  /** The full serve-or-admit cycle: look up every probe, admit the
    * misses (their own id becomes the cached answer), then re-resolve —
    * the second pass runs against cache ∪ misses for REAL (the admit
    * semantics are executed, not assumed), so every probe ends served:
    * hits from the original cache, misses from their just-admitted
    * selves. Output per probe: the pre-admit verdict plus the
    * post-admit serving id. */
  def serveAndAdmit(probes: DataFrame, probeIdCol: String, probeVecCol: String,
      cache: DataFrame, cacheIdCol: String, cacheVecCol: String,
      threshold: Double): DataFrame = {
    val pre = lookup(probes, probeIdCol, probeVecCol,
      cache, cacheIdCol, cacheVecCol, threshold)
    val misses = probes
      .join(pre.filter(!col("hit")).select(col("probe_id").as(probeIdCol)),
        Seq(probeIdCol))
    val admitted = cache.select(col(cacheIdCol), col(cacheVecCol))
      .unionByName(misses.select(col(probeIdCol).as(cacheIdCol),
        col(probeVecCol).as(cacheVecCol)))
    val post = lookup(probes, probeIdCol, probeVecCol,
        admitted, cacheIdCol, cacheVecCol, threshold)
      .select(col("probe_id"), col("served_id").as("post_served_id"))
    pre.join(post, Seq("probe_id"))
  }
}
