package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169) — the hashed-ngram importance selection a
  * pretraining curation run uses to tilt a raw web corpus toward a
  * small high-quality target corpus: score every raw document by the
  * log-likelihood ratio of two hashed bag-of-ngrams language models
  * (target vs raw), then keep the highest-ratio documents.
  *
  * Deterministic core of the paper's recipe: features are unigrams AND
  * bigrams hashed into `buckets` cells (the paper's 10^4 hashed
  * buckets); both sides get add-one smoothing; selection is exact
  * top-k by the rounded score (the paper's Gumbel-noise resampling is
  * the one piece deliberately left out — randomized selection can't be
  * hash-gated; top-k is its zero-temperature limit).
  *
  * Cross-engine determinism: the feature hash is the house char-fold
  * ((acc*31 + code) mod 1e9+7 — [[TextFunctions.fingerprint]]'s
  * arithmetic applied to the gram string) mod `buckets`, exact integer
  * both sides; λ(b) = ln((c_b+1)/(N+B)) is one double division + one
  * libm ln per bucket, and the per-doc score Σ n_b·(λ_t(b) − λ_r(b))
  * closes with round(6), absorbing ulp-level libm/summation-order
  * differences. Ordering uses the ROUNDED score (ties → doc id), so
  * the selected set is identical in both engines.
  *
  * Scale shape (100 TB raw corpus): gram extraction is the wordcount
  * shuffle (doc-keyed, map-side combined); the two LM count tables are
  * ≤ `buckets` rows each — broadcast to the per-doc feature stream, so
  * scoring adds NO extra shuffle beyond the doc-keyed partial agg; the
  * final cut is TakeOrderedAndProject (top-k, never a global sort).
  * The target corpus is typically tiny (curated); both sides stream
  * through the same one pass. */
object Dsir {

  /** Char-fold hash of a gram string into [0, buckets) — the HOF form
    * of the compiled kernel's arithmetic; kept as the spec's
    * independent reference ([[hofGramBuckets]]). */
  private def bucketOf(s: Column, buckets: Int): Column =
    pmod(aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L), lit(buckets.toLong))

  /** Interpreted uni+bigram bucket stream — equality reference for
    * [[graft.functions.TextExpressions.dsir_gram_buckets]] (the
    * compiled kernel the hot path uses). */
  private[operators] def hofGramBuckets(text: Column, buckets: Int): Column = {
    val w = words(lower(text))
    val grams = concat(w, transform(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      (x, i) => concat_ws(" ", x, element_at(w, i + 2))))
    transform(grams, g => bucketOf(g, buckets))
  }

  /** (id, __t, __b, __n): per-document hashed uni+bigram bucket counts,
    * the target flag carried through the doc-keyed shuffle (one pass —
    * no doc-keyed rejoin to recover the split). The bucket stream is
    * the compiled dsir_gram_buckets kernel (one codegen call per row;
    * the HOF composition paid a split + two lambda dispatches per char
    * and dominated the scan). */
  private def docFeatures(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    import graft.functions.TextExpressions.dsir_gram_buckets
    df.transform(Spread.byKey(_, idCol))
      .select(col(idCol), isTarget.as("__t"),
        explode(dsir_gram_buckets(lower(col(textCol)), buckets)).as("__b"))
      .groupBy(col(idCol), col("__t"), col("__b")).agg(count(lit(1)).as("__n"))
  }

  /** Importance scores for every RAW document: (idCol, score) with
    * score = Σ_b n_b(doc)·(λ_target(b) − λ_raw(b)), round(6)-closed.
    * `isTarget` splits the corpus (target rows train the numerator LM
    * and are not scored). */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    val feats = docFeatures(df, idCol, textCol, isTarget, buckets)
    val lm = feats
      .groupBy(col("__b"))
      .agg(sum(when(col("__t"), col("__n")).otherwise(0L)).as("ct"),
        sum(when(!col("__t"), col("__n")).otherwise(0L)).as("cr"))
    val totals = lm.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lambda = lm.crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((col("ct") + 1L).cast("double") /
            (col("nt") + buckets.toLong).cast("double")) -
          log((col("cr") + 1L).cast("double") /
            (col("nr") + buckets.toLong).cast("double"))).as("__ld"))
    feats.filter(!col("__t"))
      .join(broadcast(lambda), Seq("__b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__n").cast("double") * col("__ld")), 6).as("score"))
  }

  /** The selection: top-k raw documents by (rounded score desc, id). */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, buckets: Int = 4096): DataFrame =
    importanceScores(df, idCol, textCol, isTarget, buckets)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
