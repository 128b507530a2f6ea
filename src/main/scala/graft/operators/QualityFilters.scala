package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Repetition-based quality signals for corpus filtering — the
  * Gopher-style repetition rules (Rae et al. 2021, table A1): documents
  * dominated by repeated words or repeated n-grams are boilerplate/spam
  * and get filtered before training.
  *
  * Signals (raw doubles; callers threshold):
  *  - `dup_word_frac`: 1 − distinct_words / total_words — fraction of
  *    word occurrences that are repeats;
  *  - `top_bigram_frac`: occurrences of the most frequent word bigram /
  *    total bigrams — boilerplate detectors (the Gopher rule family uses
  *    top 2-/3-/4-gram coverage; the bigram is the representative one).
  *
  * Scale shape: word stats are narrow per-row expressions (no shuffle);
  * the bigram mode is explode → (doc, bigram) partial-count → per-doc
  * max — two map-side-combined aggregations sharing one doc-keyed
  * shuffle, nothing proportional to vocabulary size.
  */
object QualityFilters {

  /** Per-doc repetition signals: (idCol, dup_word_frac, top_bigram_frac). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .repartition(col(idCol)) // spread the per-doc compute (Dedup.spread)
      .select(col(idCol), words(col(textCol)).as("w"))
    val wordStats = base.select(col(idCol),
      size(col("w")).as("n_words"),
      size(array_distinct(col("w"))).as("n_distinct"))
    val bigramStats = base
      .select(col(idCol), explode(shinglesOf(col("w"), 2)).as("s"))
      .groupBy(col(idCol), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bg"))
    wordStats
      .join(bigramStats, Seq(idCol), "left")
      .select(col(idCol),
        when(col("n_words") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_words"))
          .as("dup_word_frac"),
        coalesce(col("top_c").cast("double") / col("n_bg"), lit(0.0))
          .as("top_bigram_frac"))
  }
}
