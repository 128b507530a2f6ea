package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** Hubness audit of an embedding space — the k-occurrence skew that
  * quietly breaks retrieval: in high dimensions some points ("hubs")
  * appear in a huge fraction of other points' k-NN lists while
  * "anti-hubs" appear in none (Radovanović et al., JMLR 2010). A
  * hubby embedding space returns the same documents for everything —
  * RAG quality collapses while every per-query metric still looks
  * fine. The audit: N_k(x) = how often x appears in others' k-NN
  * lists; report its distribution and skewness (healthy ≈ 0–1,
  * pathological > 3).
  *
  * Exactness: neighbor lists rank by (cosine DESC, id) — the q30/q31
  * deterministic tie order; occurrence counts, the histogram, and the
  * raw moments Σocc/Σocc²/Σocc³ are exact BIGINTs (E[N_k] = k by
  * construction — a built-in self-check); mean/variance/skewness
  * close in doubles, 6-dp.
  *
  * Scale shape: this is the EXACT form — an n² cosine self-join
  * (per-task k-heaps via the window rank, no corpus sort), right for
  * audit-sized samples (≤ ~10⁵ vectors: sample first, the q51
  * machinery). At corpus scale, feed the same occurrence counting
  * from ANN candidates instead (IvfIndex.searchMany produces the
  * lists; the audit math downstream is identical). */
object Hubness {

  /** Histogram rows (occurrences, n_points) with pooled
    * (n, k, mean_occ, variance, skewness, max_occ) repeated. */
  def kOccurrence(df: DataFrame, idCol: String, vecCol: String,
                  k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"bad k=$k")
    val a = df.select(col(idCol).as("__pid"), col(vecCol).as("__pv"))
    val b = df.select(col(idCol).as("__nid"), col(vecCol).as("__nv"))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__sim").desc, col("__nid").asc)
    val top = a.join(b, col("__pid") =!= col("__nid"))
      .withColumn("__sim", cosine_sim(col("__pv"), col("__nv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__nid"))
    occurrenceStats(df, idCol, top, k)
  }

  /** The corpus-scale form: the SAME k-occurrence math fed by an ANN
    * candidate stream (IvfIndex.searchMany / HnswIndex output shape —
    * one row per (probe, candidate, sim)) instead of the n² cosine
    * self-join. The caller over-fetches k+1 candidates per probe so the
    * probe's own row can be excluded here; candidates re-rank by
    * (sim DESC, id ASC) — the q30/q31 deterministic tie order, which is
    * also the heap order of VectorSearch.TopKAgg, so the top-k AFTER
    * self-exclusion is exactly the top-k among non-self candidates.
    *
    * With nprobe = numLists the candidate stream is exhaustive and this
    * EQUALS [[kOccurrence]] restricted to the probe set (spec-asserted);
    * at partial nprobe it is the production audit: N_k measured over
    * what retrieval actually serves.
    *
    * Scale shape: the candidate stream is probes×(k+1)·fan rows — cost
    * tracks candidates, never n²; the window partitions per probe on
    * that bounded stream; the occurrence join is one key-shuffle of
    * (id, count) pairs. */
  def kOccurrenceFromCandidates(points: DataFrame, idCol: String,
                                candidates: DataFrame, probeIdCol: String,
                                neighborIdCol: String, simCol: String,
                                k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"bad k=$k")
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__sim").desc, col("__nid").asc)
    val top = candidates
      .select(col(probeIdCol).as("__pid"), col(neighborIdCol).as("__nid"),
        col(simCol).as("__sim"))
      .filter(col("__pid") =!= col("__nid"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__nid"))
    occurrenceStats(points, idCol, top, k)
  }

  /** Shared close: occurrence counts over ALL points (absent from every
    * list = 0 — the anti-hubs are the signal), histogram, exact BIGINT
    * raw moments, scalar skew. `top` carries one __nid per (probe,
    * ranked-neighbor) pair. */
  private def occurrenceStats(df: DataFrame, idCol: String,
                              top: DataFrame, k: Int): DataFrame = {
    val occ = df.select(col(idCol).as("__nid"))
      .join(top.groupBy(col("__nid")).agg(count(lit(1)).as("__o")),
        Seq("__nid"), "left")
      .na.fill(0L, Seq("__o"))
    val hist = occ.groupBy(col("__o").as("occurrences"))
      .agg(count(lit(1)).as("n_points"))
    val m = occ.agg(count(lit(1)).as("__n"), sum(col("__o")).as("__s1"),
      sum(col("__o") * col("__o")).as("__s2"),
      sum(col("__o") * col("__o") * col("__o")).as("__s3"),
      max(col("__o")).as("__mx")).head()
    val n = m.getLong(0)
    require(n > k, s"hubness: $n points for k=$k")
    val mean = m.getLong(1).toDouble / n
    val variance = m.getLong(2).toDouble / n - mean * mean
    require(variance > 0.0,
      "hubness: degenerate occurrence distribution (all equal)")
    val m3 = m.getLong(3).toDouble / n - 3.0 * mean *
      (m.getLong(2).toDouble / n) + 2.0 * mean * mean * mean
    hist.select(col("occurrences"), col("n_points"),
      lit(n).as("n"), lit(k.toLong).as("k"),
      round(lit(mean), 6).as("mean_occ"),
      round(lit(variance), 6).as("variance"),
      round(lit(m3 / math.pow(variance, 1.5)), 6).as("skewness"),
      lit(m.getLong(4)).as("max_occ"))
      .orderBy(col("occurrences"))
  }
}
