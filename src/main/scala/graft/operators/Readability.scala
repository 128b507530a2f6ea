package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level readability audit — Flesch reading ease and
  * Flesch–Kincaid grade per group (source, lang, domain): the
  * training-data curator's "is this feed prose or boilerplate" scalar.
  * A feed whose reading ease collapses toward 0 turned into legalese
  * or minified markup; one that jumps past 100 degenerated into
  * word-salad or navigation chrome. Reference: Kincaid et al. 1975
  * (the recalculated Navy formulas):
  *
  *   ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
  *   grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
  *
  * Syllables use the standard vowel-group heuristic (maximal
  * `[aeiouy]+` runs — exact for the synthetic corpus, ±10% on real
  * English, consistent across engines because both count the same
  * regex matches); sentences are `[.!?]+` runs floored at one per
  * document so punctuation-free documents count as single sentences.
  *
  * Exactness: the three counts are per-document INTEGERS summed as
  * BIGINTs per group (order-free), and the two formulas run once on
  * the aggregate ratios (corpus-level readability, not
  * mean-of-document readability — the aggregate form weights long
  * documents proportionally and keeps every double out of the
  * accumulation). Bit-stable on any partitioning; SQL-replayable.
  *
  * Scale shape: ONE map-side-combined aggregate over the corpus onto
  * the group grid; the formulas run on ≤groups rows. The regex
  * counters are codegen string expressions — no UDF, no tokenize
  * shuffle (the terms never leave their task). */
object Readability {

  /** Per group: (group, n_docs, words, sentences, syllables,
    * flesch_ease, fk_grade), ease/grade rounded to 1e-6. */
  def fleschPerGroup(df: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val words = regexp_count(t, lit("[a-z0-9]+")).cast("long")
    val sents = greatest(regexp_count(t, lit("[.!?]+")).cast("long"),
      lit(1L))
    val syll = regexp_count(t, lit("[aeiouy]+")).cast("long")
    df.filter(col(textCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(words).as("words"),
        sum(sents).as("sentences"),
        sum(syll).as("syllables"))
      .filter(col("words") > 0)
      .select(col(groupCol), col("n_docs"), col("words"), col("sentences"),
        col("syllables"),
        round(lit(206.835) -
          lit(1.015) * (col("words").cast("double") /
            col("sentences").cast("double")) -
          lit(84.6) * (col("syllables").cast("double") /
            col("words").cast("double")), 6).as("flesch_ease"),
        round(lit(0.39) * (col("words").cast("double") /
          col("sentences").cast("double")) +
          lit(11.8) * (col("syllables").cast("double") /
            col("words").cast("double")) - lit(15.59), 6).as("fk_grade"))
      .orderBy(col(groupCol))
  }
}
