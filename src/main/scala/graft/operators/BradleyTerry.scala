package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry preference-strength fitting — the model under every
  * pairwise-preference pipeline (RLHF reward-model data curation,
  * LLM-judge tournaments, A/B ranking panels): given "i beat j"
  * counts, recover latent strengths p with P(i beats j) =
  * pᵢ/(pᵢ+pⱼ), via Hunter's MM iteration (Hunter 2004)
  *
  *   pᵢ ← Wᵢ / Σ_{j≠i} (n_ij + n_ji)/(pᵢ + pⱼ),  then normalize
  *
  * — each step provably increases the likelihood, no learning rate.
  * The curation uses: turn noisy judge votes into a consistent
  * leaderboard, detect intransitive judges (fit deviance), and weight
  * training pairs by strength gap.
  *
  * Scale/determinism split (the Mmr/PQ-rerank cost shape): the CORPUS
  * work is one exact (winner, loser) count aggregate — comparisons at
  * 100 TB reduce to an items²-bounded matrix; the MM fixpoint then
  * runs on that bounded matrix driver-side (loudly capped), folding
  * items in SORTED order with a FLOAT32 cast per iteration (the
  * k-means/power-iteration replay discipline — the cast absorbs
  * fold-order ulps, so the fitted strengths replay bit-exact in the
  * oracle's unrolled CTEs). Items with zero wins fit to strength 0 —
  * the MM limit, reported honestly, not smoothed away. */
object BradleyTerry {

  val MaxItems = 4096 // items² driver matrix bound — loud, not silent

  /** Per item: (item, wins, losses, strength, rank) — strengths
    * normalized to Σ = 1, rank by (strength desc, item). */
  def fit(pairs: DataFrame, winnerCol: String, loserCol: String,
          iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 64, s"bad iters=$iters")
    val counts = pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .groupBy(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__n"))
      .collect() // bounded: ≤ items² cells (guarded below)
    val items = counts.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    require(items.nonEmpty, "BradleyTerry: no comparisons")
    require(items.length <= MaxItems,
      s"BradleyTerry: ${items.length} items exceeds the $MaxItems driver " +
        "matrix bound — shard the tournament or aggregate items first")
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val n = Array.ofDim[Long](k, k)
    counts.foreach(r => n(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val wins = Array.tabulate(k)(i => n(i).sum)
    val losses = Array.tabulate(k)(j => (0 until k).map(i => n(i)(j)).sum)
    var p = Array.fill(k)((1.0 / k).toFloat)
    var it = 0
    while (it < iters) {
      val next = Array.tabulate(k) { i =>
        var denom = 0.0
        var j = 0
        while (j < k) { // sorted item order — the replayable fold
          if (j != i && n(i)(j) + n(j)(i) > 0)
            denom += (n(i)(j) + n(j)(i)).toDouble /
              (p(i).toDouble + p(j).toDouble)
          j += 1
        }
        if (denom == 0.0) 0.0 else wins(i) / denom
      }
      val z = next.sum // sorted order
      require(z > 0, "BradleyTerry: all strengths collapsed to 0")
      p = next.map(x => (x / z).toFloat)
      it += 1
    }
    val spark = pairs.sparkSession
    val ranked = items.indices.sortBy(i => (-p(i).toDouble, items(i)))
      .zipWithIndex.map { case (i, r) => (i, r + 1) }.toMap
    spark.createDataFrame(items.indices.map(i =>
        (items(i), wins(i), losses(i), p(i).toDouble, ranked(i))))
      .toDF("item", "wins", "losses", "strength", "rank")
      .orderBy(col("item"))
  }

  /** Fit-quality audit — the judge-INTRANSITIVITY detector: per
    * unordered pair the observed win rate vs the fitted
    * pᵢ/(pᵢ+pⱼ), and the pair's binomial deviance contribution
    * −2·[n_ij·ln(fit) + n_ji·ln(1−fit)] (saturated-model terms with
    * 0·ln0 = 0). A pair whose observed rate sits far from its fitted
    * rate is evidence the comparisons are NOT one consistent strength
    * scale (cyclic judges, population mixture, a prompt that flips
    * preferences) — exactly what a leaderboard silently hides. The
    * total deviance rides every row for the scalar read.
    *
    * Same scale shape as [[fit]]: the corpus reduces to the bounded
    * count matrix once; everything here is items²-bounded arithmetic
    * (deviance terms folded in pair order). */
  def fitAudit(pairs: DataFrame, winnerCol: String, loserCol: String,
               iters: Int = 8): DataFrame = {
    val spark = pairs.sparkSession
    val fitted = fit(pairs, winnerCol, loserCol, iters)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val counts = pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .groupBy(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val unordered = counts.keys.map { case (a, b) =>
      if (a < b) (a, b) else (b, a)
    }.toSeq.distinct.sorted
    val rows = unordered.map { case (a, b) =>
      val nab = counts.getOrElse((a, b), 0L)
      val nba = counts.getOrElse((b, a), 0L)
      val n = nab + nba
      val fitRate = fitted(a) / (fitted(a) + fitted(b))
      val obsRate = nab.toDouble / n
      val dev = -2.0 * ((if (nab > 0) nab * math.log(fitRate) else 0.0) +
        (if (nba > 0) nba * math.log(1 - fitRate) else 0.0) -
        ((if (nab > 0) nab * math.log(obsRate) else 0.0) +
          (if (nba > 0) nba * math.log(1 - obsRate) else 0.0)))
      (a, b, nab, nba, obsRate, fitRate, dev)
    }
    val total = rows.map(_._7).sum // pair-sorted fold order
    spark.createDataFrame(rows.map(r => (r._1, r._2, r._3, r._4,
        BigDecimal(r._5).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(r._6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(r._7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(total).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)))
      .toDF("item_a", "item_b", "n_ab", "n_ba", "obs_rate", "fit_rate",
        "deviance", "total_deviance")
      .orderBy(col("item_a"), col("item_b"))
  }
}
