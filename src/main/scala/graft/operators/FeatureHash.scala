package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick featurizer (Weinberger, Dasgupta, Langford, Smola,
  * Attenberg, "Feature Hashing for Large Scale Multitask Learning",
  * ICML 2009): terms hash into a FIXED dimension space with a ±1 sign
  * hash, so the feature space needs no vocabulary table, no fitting
  * pass, and no driver state — the standard text featurizer when the
  * vocab is unbounded (URLs, user tokens, subwords) and the model wants
  * a fixed-width input. The sign hash makes collisions cancel in
  * expectation (the inner-product-preserving trick that separates
  * hashing from naive bucketing).
  *
  * Output is exact-integer SPARSE triples (id, dim, value = Σ ±tf):
  * triples are what a downstream trainer/JL projection consumes, they
  * hash-compare exactly, and the dense form is one `map_from_entries`
  * away when wanted. Exact-zero cancellations are dropped (true sparse
  * semantics, replayed by the oracle's HAVING).
  *
  * Reuses the engine's replayable hash stack ([[Splits.stringKey]]
  * polynomial → [[Splits.hashBucket]] Knuth multiply; sign = low bit of
  * the polynomial key) — one implementation on both build and oracle
  * side, the q159/q161 discipline.
  *
  * Scale shape: one tokenize + one (id, dim)-keyed map-side-combined
  * aggregate; output ≤ min(distinct terms, dims) rows per doc. */
object FeatureHash {

  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  dims: Int): DataFrame = {
    require(dims >= 2, s"need at least 2 dims, got $dims")
    val tf = KeywordRank.termFreq(df, idCol, textCol)
    val key = Splits.stringKey(col("term"))
    tf.withColumn("__key", key)
      .withColumn("dim", Splits.hashBucket(col("__key"), dims))
      .withColumn("__sign", pmod(col("__key"), lit(2L)) * 2 - 1)
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("tf") * col("__sign")).as("value"))
      .filter(col("value") =!= 0)
  }
}
