package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Per-probe nDCG@k with binary relevance: DCG = Σ_{rel ranks} 1/log2(r+1),
    * IDCG = the same sum over ranks 1..min(n_rel, k). Lives OUTSIDE the
    * oracle-facing [[evaluate]] on purpose — libm log drift makes nDCG
    * epsilon-comparable, not hash-comparable (spec-tested with a
    * tolerance instead). */
  def ndcg(results: DataFrame, qrels: DataFrame, k: Int,
           probeCol: String = "probe_id", docCol: String = "doc_id",
           rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"bad k=$k")
    val rel = qrels.select(col(probeCol), col(docCol)).withColumn("__rel", lit(1))
    val dcg = results.filter(col(rankCol) <= k)
      .join(rel, Seq(probeCol, docCol), "left")
      .groupBy(col(probeCol))
      .agg(sum(when(col("__rel") === 1,
        lit(1.0) / log2(col(rankCol).cast("double") + 1.0)).otherwise(lit(0.0)))
        .as("__dcg"))
    val nRel = qrels.groupBy(col(probeCol)).agg(count(lit(1)).as("n_rel"))
    // ideal DCG: all relevant docs at the top ranks
    val idcg = nRel.withColumn("__ideal", least(col("n_rel"), lit(k.toLong)))
      .withColumn("__idcg",
        aggregate(sequence(lit(1L), col("__ideal")), lit(0.0d),
          (acc, r) => acc + lit(1.0) / log2(r.cast("double") + 1.0)))
    idcg.join(dcg, Seq(probeCol), "left")
      .select(col(probeCol), col("n_rel"),
        (coalesce(col("__dcg"), lit(0.0)) / col("__idcg")).as("ndcg"))
  }

  /** lcm(1..k) — every rank ≤ k divides it, so precision terms scale to
    * integers. Fits a signed 64-bit comfortably through k = 40. */
  /** Rank-biased overlap at depth k (Webber, Moffat & Zobel 2010) —
    * the top-k ranking-drift metric the distribution family (q278
    * vocab JSD) cannot be: JSD weighs mass, RBO weighs ORDER with a
    * top-heavy geometric persistence p, which is how "did our top
    * terms / top products / top suppliers change" should be read.
    * The truncated prefix form:
    *
    *   RBO@k = (1−p) Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d
    *
    * The overlap counts are EXACT off one full-join of the two
    * rankings: |A_d ∩ B_d| = #{items: max(rank_A, rank_B) ≤ d} — a
    * cumulative histogram of the max-rank, no per-depth set work.
    * The geometric weights are PINNED 12-dp doubles (the SES weights
    * discipline) so engines never race libm pow; the fold runs in
    * depth order. Ranking ties inside each list break by item id
    * (deterministic, documented).
    *
    * Input: two (item, weight) frames; ranking = weight desc, item
    * asc, truncated at k. Output: one row per depth (depth, overlap,
    * agreement = overlap/d, rbo_at_k repeated) — the trajectory shows
    * WHERE the lists diverge; the scalar is the verdict.
    *
    * Scale shape: two top-k TakeOrdered passes (k ≤ 4096) + a k-row
    * full join; everything after runs on ≤k rows driver-side. */
  def rbo(a: DataFrame, b: DataFrame, itemCol: String, weightCol: String,
          k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 4096, s"rbo: k=$k outside [1, 4096]")
    require(p > 0.0 && p < 1.0, s"rbo: p=$p outside (0,1)")
    def topK(df: DataFrame): DataFrame = {
      val w = Window.orderBy(col(weightCol).desc, col(itemCol))
      df.filter(col(itemCol).isNotNull && col(weightCol).isNotNull)
        .orderBy(col(weightCol).desc, col(itemCol)).limit(k)
        .withColumn("__r", row_number().over(w).cast("long"))
        .select(col(itemCol).as("__item"), col("__r"))
    }
    val ra = topK(a).withColumnRenamed("__r", "__ra")
    val rb = topK(b).withColumnRenamed("__r", "__rb")
    val spark = a.sparkSession
    val maxRanks = ra.join(rb, Seq("__item"), "inner")
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
      .groupBy(col("__m")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wts = Smoothing.weights(1.0 - p, k) // p^{d-1}, pinned 12-dp
    var cum = 0L; var rboSum = 0.0
    val traj = (1 to k).map { d =>
      cum += maxRanks.getOrElse(d.toLong, 0L)
      rboSum += wts(d - 1) * cum.toDouble / d.toDouble
      (d.toLong, cum, cum.toDouble / d.toDouble)
    }
    val rboK = (1.0 - p) * rboSum
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField,
      LongType, DoubleType}
    spark.createDataFrame(
      traj.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3, rboK))
        .asJava,
      StructType(Seq(StructField("depth", LongType),
        StructField("overlap", LongType),
        StructField("agreement", DoubleType),
        StructField("rbo_at_k", DoubleType))))
      .select(col("depth"), col("overlap"),
        round(col("agreement"), 6).as("agreement"),
        round(col("rbo_at_k"), 6).as("rbo_at_k"))
      .orderBy(col("depth"))
  }

  private[operators] def rankLcm(k: Int): Long = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1L to k).foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
  }

  /** Per-probe recall@k, MRR@k and AP@k (average precision). `results`
    * carries (probeCol, docCol, rankCol) with rank starting at 1;
    * `qrels` carries (probeCol, docCol) — one row per relevant
    * document. Probes present in qrels but absent from results score 0
    * (never silently dropped).
    *
    * AP stays exact the same way the engine's other float-adjacent
    * oracles do: each precision term hits_i/i is scaled by lcm(1..k)
    * into an INTEGER (every rank divides the lcm), the per-probe sum is
    * integer addition (associative — partitioning- and engine-
    * independent), and only the final single division produces a
    * double. A naive Σ of double precisions would drift in the last
    * ulp with aggregation order. */
  def evaluate(results: DataFrame, qrels: DataFrame, k: Int,
               probeCol: String = "probe_id", docCol: String = "doc_id",
               rankCol: String = "rn"): DataFrame = {
    require(k > 0 && k <= 40, s"bad k=$k (rank lcm overflows past 40)")
    val l = rankLcm(k)
    val rel = qrels.select(col(probeCol), col(docCol)).withColumn("__rel", lit(1))
    val inK = results.filter(col(rankCol) <= k)
      .join(rel, Seq(probeCol, docCol), "left")
    // cumulative hits at each rank — the precision numerator
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(probeCol)).orderBy(col(rankCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withCum = inK.withColumn("__cumhits",
      sum(coalesce(col("__rel"), lit(0))).over(w))
    val perProbe = withCum.groupBy(col(probeCol)).agg(
      sum(coalesce(col("__rel"), lit(0))).as("__hits"),
      min(when(col("__rel") === 1, col(rankCol))).as("__frr"),
      // Σ over relevant ranks of cumhits·(lcm/rank) — exact integers
      sum(when(col("__rel") === 1,
        col("__cumhits") * (lit(l) / col(rankCol).cast("long")).cast("long"))
        .otherwise(lit(0L))).as("__apnum"))
    val nRel = qrels.groupBy(col(probeCol)).agg(count(lit(1)).as("n_rel"))
    nRel.join(perProbe, Seq(probeCol), "left")
      .select(col(probeCol),
        col("n_rel"),
        coalesce(col("__hits"), lit(0L)).cast("long").as("hits"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / col("n_rel"), 6)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__frr"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("__apnum"), lit(0L)).cast("double")
          / (lit(l.toDouble) * col("n_rel")), 6).as("ap"))
  }
}
