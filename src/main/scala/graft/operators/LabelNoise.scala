package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim
import graft.search.VectorSearch

/** k-NN label-agreement audit — the embedding-space label-noise
  * detector (the confident-learning family, Northcutt et al. 2021,
  * reduced to its non-parametric core): a row whose k nearest
  * neighbors mostly carry a DIFFERENT label is either mislabeled or
  * sits on a class boundary; a label column whose corpus-wide
  * agreement is near 1/|classes| is noise and shouldn't gate
  * training. Run before trusting any labeled slice.
  *
  * Two faces:
  *  - [[knnLabelAgreement]]: exact — neighbor search via the bounded-
  *    heap top-k aggregate (the q32 shape: corpus scanned once, probes
  *    broadcast, shuffle carries partitions×probes×k rows). Exact is
  *    for verify scale and bounded probe sets; broadcasting the whole
  *    corpus as probes does NOT scale.
  *  - [[agreementFromHits]]: the 100 TB path — feed hits from ANY
  *    batched searcher honoring the (probe_id, id, rn) contract
  *    (`IvfIndex.searchMany`, `HnswIndex.searchMany`), so the audit
  *    rides the ANN index the corpus already has; agreement is then
  *    approximate exactly as recall is (the recall gates bound it).
  *
  * Self-exclusion happens BEFORE the k-heap (filter on id inequality
  * in the scored stream), so duplicate vectors of the probe still
  * count as neighbors — the semantics the oracle replays. */
object LabelNoise {

  /** (id, label, n_same, agree) with exact cosine k-NN, self excluded. */
  def knnLabelAgreement(df: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, k: Int): DataFrame = {
    val p = df.select(col(idCol).cast("long").as("probe_id"),
      col(vecCol).as("__pvec"))
    val topk = udaf(new VectorSearch.TopKAgg(k))
    val hits = df.select(col(idCol).cast("long").as("__nid"), col(vecCol))
      .crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("__nid"))
      .withColumn("sim", cosine_sim(col(vecCol), col("__pvec")))
      .groupBy(col("probe_id"))
      .agg(topk(col("__nid"), col("sim")).as("hits"))
      .select(col("probe_id"), explode(col("hits")).as("hit"))
      .select(col("probe_id"), col("hit._1").as("__nid"))
    agreementFromHits(hits, "probe_id", "__nid",
      df.select(col(idCol).cast("long").as("__lid"), col(labelCol).as("__lbl")),
      "__lid", "__lbl", k)
  }

  /** Join any searcher's (probeIdCol, hitIdCol) hit stream back to the
    * label table and roll up per-probe agreement. `k` only names the
    * denominator — rows with fewer hits (corpus edge) divide by their
    * own hit count. */
  def agreementFromHits(hits: DataFrame, probeIdCol: String, hitIdCol: String,
                        labels: DataFrame, labelIdCol: String, labelCol: String,
                        k: Int): DataFrame = {
    val nl = labels.select(col(labelIdCol).as("__nid2"), col(labelCol).as("__nl"))
    hits.select(col(probeIdCol).as("id"), col(hitIdCol).as("__nid2"))
      .join(nl, "__nid2")
      .join(labels.select(col(labelIdCol).as("id"), col(labelCol).as("label")), "id")
      .groupBy(col("id"), col("label"))
      .agg(sum(when(col("__nl") === col("label"), 1L).otherwise(0L)).as("n_same"),
        count(lit(1)).as("__nh"))
      .select(col("id"), col("label"), col("n_same"),
        (col("n_same").cast("double") / col("__nh").cast("double")).as("agree"))
  }
}
