package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IrMetrics

/** Data-driven serve-parameter choice: the reference picks its index
  * kind and parameters by static config (appsettings.json:24 —
  * `vector-ivf` vs `vector-hnsw`); here the equivalent knob (IVF
  * `nprobe`, HNSW `ef`) is chosen by MEASURING recall@k on a held-out
  * probe set against exact ground truth, composing the existing
  * searchers with [[graft.operators.IrMetrics.evaluate]] — no new
  * metric code, no trust in analytic recall formulas.
  *
  * Scale shape: the probe set is the small side by construction
  * (held-out sample); each candidate evaluation is one batched ANN
  * search (probes×k rows out) plus one IrMetrics join against the
  * probes×k truth table. The corpus is touched only by the searches
  * themselves, and the walk early-stops at the first satisfying
  * parameter — smaller params are cheaper, so the scan order is also
  * the cost order.
  */
object RecallTuner {

  /** Mean recall@k of `results` (probeCol, docCol, rankCol) against the
    * exact-top-k `truth` (probeCol, docCol), via IrMetrics — probes
    * missing from results score 0, never silently drop. */
  def meanRecall(results: DataFrame, truth: DataFrame, k: Int,
                 probeCol: String = "probe_id", docCol: String = "vec_id",
                 rankCol: String = "rn"): Double = {
    val r = IrMetrics.evaluate(results, truth, k, probeCol, docCol, rankCol)
      .agg(avg(col("recall_at_k"))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** The tuned parameter, its measured recall, and the full measured
    * (param, recall) prefix of the candidate walk (ascending; stops at
    * the chosen param). */
  final case class Tuned(param: Int, recall: Double, curve: Seq[(Int, Double)])

  /** Walk `candidates` ASCENDING and return the first (= minimal, given
    * ascending order) parameter whose measured mean recall@k reaches
    * `target`. `run(param)` executes the batched search at that
    * parameter and returns (probeCol, docCol, rankCol) results. Fails
    * loudly — with the measured curve in the message — when no
    * candidate reaches the target: a silently sub-target serve
    * parameter is a wrong answer, not a tuning result. */
  def tune(candidates: Seq[Int], target: Double, k: Int, truth: DataFrame,
           run: Int => DataFrame,
           probeCol: String = "probe_id", docCol: String = "vec_id",
           rankCol: String = "rn"): Tuned = {
    require(candidates.nonEmpty && candidates == candidates.sorted,
      s"candidates must be non-empty ascending: $candidates")
    require(target > 0 && target <= 1, s"bad target $target")
    val measured = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    candidates.foreach { p =>
      val rec = meanRecall(run(p), truth, k, probeCol, docCol, rankCol)
      measured += ((p, rec))
      if (rec >= target) return Tuned(p, rec, measured.toSeq)
    }
    throw new IllegalStateException(
      s"no candidate reaches recall@$k >= $target; measured curve: " +
        measured.map { case (p, r) => s"$p->${"%.4f".format(r)}" }.mkString(", "))
  }

  /** Tune IVF `nprobe` over `1..numLists` (or a sparser grid): minimal
    * probe count whose batched search hits the recall target. */
  def tuneIvfNprobe(idx: IvfIndex, indexed: DataFrame, vecCol: String, idCol: String,
                    probes: DataFrame, probeIdCol: String, probeVecCol: String,
                    k: Int, target: Double, truth: DataFrame,
                    candidates: Seq[Int] = Nil): Tuned = {
    val grid = if (candidates.nonEmpty) candidates else 1 to idx.centroids.length
    tune(grid, target, k, truth, nprobe =>
      idx.searchMany(indexed, vecCol, idCol, probes, probeIdCol, probeVecCol,
        k, nprobe), docCol = idCol)
  }

  /** Tune HNSW `ef` over an ascending grid: minimal beam width whose
    * batched search hits the recall target. */
  def tuneHnswEf(graphs: DataFrame, probes: DataFrame,
                 probeIdCol: String, probeVecCol: String,
                 k: Int, target: Double, truth: DataFrame,
                 candidates: Seq[Int]): Tuned =
    tune(candidates, target, k, truth, ef =>
      HnswIndex.searchMany(graphs, probes, probeIdCol, probeVecCol, k, ef))
}
