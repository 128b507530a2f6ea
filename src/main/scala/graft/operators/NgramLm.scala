package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Bigram language-model surprisal in exact integer bits — the
  * train-on-reference / score-target quality signal of the CCNet curation
  * pipeline (Wenzek et al. 2020: a KenLM trained on a trusted slice
  * separates in-domain prose from gibberish and out-of-domain text by
  * per-token perplexity). [[QualityFilters.unigramRarity]] is the
  * context-free version of this signal; here the model is CONDITIONAL —
  * p(w|prev) — so word-salad built from individually-common words (which
  * unigram rarity scores as perfectly normal) lights up through its
  * never-seen transitions.
  *
  * The engine keeps the whole computation in the bits idiom (floor-log2
  * via binary-string length — the q90 rarity family): per scored bigram,
  * Laplace-smoothed conditional surprisal
  *
  *   s(w2|w1) = bitlen(c(w1) + V) − bitlen(c(w1,w2) + 1)
  *
  * where c(·) are reference-slice counts and V is the reference vocabulary
  * size (the +V/+1 Laplace pair keeps every transition scoreable: an
  * unseen context costs bitlen(V) bits, an unseen transition in a known
  * context costs the context's full bits). Integer end to end — the score
  * is bit-reproducible on any partitioning and SQL-oracle-exact; the only
  * double is the final per-document mean.
  *
  * Scale shape (the reason an n-gram LM — not a neural one — is the
  * curation workhorse): TRAIN is two map-side-combined word-keyed
  * aggregates whose outputs are vocabulary-bounded (Zipf: distinct
  * bigrams ≪ token occurrences), not corpus-bounded. SCORE is one narrow
  * bigram explode over the target, two term-keyed joins against the count
  * tables (left joins — unseen transitions are the signal, they must
  * survive), and one doc-keyed partial-agg shuffle. Nothing is ever
  * corpus × corpus; the model "state" is a DataFrame pair, so training on
  * 1 TB of reference text and scoring 100 TB is two ordinary shuffled
  * passes. Reference delegate analog: the reference has no quality
  * scoring at all (ingest is trust-the-blob, IngestAndVectorize.cs:31-59)
  * — this is the curation layer a training pipeline puts in front of it.
  */
object NgramLm {

  /** Counts from the reference slice: (bigrams(w1, w2, c12),
    * contexts(w1, c1), vocabSize). The two tables share one tokenize
    * pass's lineage; both are vocabulary-bounded. */
  final case class Model(bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** Train on a reference corpus slice. `contexts` counts every token
    * OCCURRENCE of w1 that has a successor (so Σ over w2 of c12 == c1
    * exactly — the conditional distribution normalizes); `vocab` is a
    * 1-row relation carrying |V| so the plan stays closed (no driver
    * scalar, same discipline as unigramRarity's total). */
  def train(ref: DataFrame, textCol: String): Model = {
    val w = ref.select(words(col(textCol)).as("w")).filter(size(col("w")) >= 1)
    val bi = w.filter(size(col("w")) >= 2)
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bigrams = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val contexts = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = w.select(explode(col("w")).as("t")).agg(
      count_distinct(col("t")).as("v"))
    Model(bigrams, contexts, vocab)
  }

  /** Score a target corpus against a trained model. Output per document:
    * (idCol, n_bigrams, surprisal_bits, mean_bits) — `surprisal_bits` is
    * the exact integer Σ s(w2|w1); documents with <2 tokens score 0 over
    * 0 bigrams (nothing to condition on, not evidence of quality either
    * way). High mean = transitions the reference never makes. */
  def score(target: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val bi = target
      .transform(Spread.byKey(_, idCol)) // spread the per-doc compute (Dedup.spread)
      .select(col(idCol), words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = bi
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col(idCol),
        (length(bin(coalesce(col("c1"), lit(0L)) + col("v"))) -
          length(bin(coalesce(col("c12"), lit(0L)) + lit(1L)))).cast("long").as("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("surprisal_bits"))
    target.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        coalesce(round(col("surprisal_bits").cast("double") / col("n_bigrams"), 6),
          lit(0.0)).as("mean_bits"))
  }
}
