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
      .transform(Spread.byKey(_, idCol)) // spread the per-doc compute (Dedup.spread)
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

  /** Unigram rarity score — the cheap perplexity proxy (CCNet-style:
    * documents whose words are corpus-rare score high; gibberish and
    * over-common boilerplate separate from mid-band prose). Per word
    * occurrence, rarity = bitlen(total corpus occurrences) −
    * bitlen(corpus frequency of the word) — an integer floor(log2)
    * bucketing of −log2 p(w) that is EXACT in both engines (binary-
    * string length, no floating log at bucket boundaries), so the score
    * itself is SQL-oracle-exact; the only double is one final division
    * per document.
    *
    * Output: (idCol, n_words, rarity_sum: long, mean_rarity: double).
    * Empty docs score 0. Scale shape: one shuffle for the corpus
    * frequency table (vocabulary-sized, map-side combined), one
    * word-keyed join of the occurrence stream against it, one doc-keyed
    * partial-agg shuffle — nothing driver-side, nothing n². */
  def unigramRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = df
      .transform(Spread.byKey(_, idCol)) // spread the per-doc compute (Dedup.spread)
      .select(col(idCol), explode(words(col(textCol))).as("w"))
    val cf = occ.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    // total-corpus bit length as a broadcast 1-row aggregate (derived
    // from cf, so the occurrence stream is scanned once) — keeping it in
    // the plan avoids a separate driver-side pre-action per call
    val tot = cf.agg(length(bin(greatest(sum(col("cf")), lit(1L)))).as("__tb"))
    val scored = occ.join(cf, "w").crossJoin(broadcast(tot))
      .select(col(idCol), (col("__tb") - length(bin(col("cf")))).cast("long").as("r"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("r")).as("rarity_sum"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("rarity_sum"), lit(0L)).as("rarity_sum"),
        coalesce(round(col("rarity_sum").cast("double") / col("n_words"), 6), lit(0.0))
          .as("mean_rarity"))
  }

  /** Gopher's eight required stopwords (Rae et al. 2021, table A1's
    * "stop word" rule) — distinct-presence count, threshold 2. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The NON-repetition half of the Gopher rule battery (Rae et al.
    * 2021, table A1; the repetition half is [[repetitionSignals]]):
    * per-document word-level structure rules with per-rule verdicts and
    * the conjunctive `keep` — the form a curation run consumes (audit
    * WHICH rule rejected a document, not just that one did).
    *
    *  - word count in [50, 100 000];
    *  - mean word length in [3, 10] (true word-length mean — q45's
    *    `mean_word_len` is the alnum-chars/words ratio, a different
    *    feature);
    *  - symbol-to-word ratio ≤ 0.1 ('#' occurrences + '...' runs);
    *  - ≥ 80 % of words contain an alphabetic character;
    *  - ≥ 2 distinct hits among [[GopherStopwords]].
    *
    * The published thresholds are defaults, not knobs the corpus tuned:
    * on symbol-free corpora `symbol_word_ratio` is identically 0 and
    * the rule passes vacuously (the spec exercises it on adversarial
    * docs). Everything is a narrow per-row expression — no shuffle, no
    * joins; the only doubles are three final ratios, round(6)-closed
    * for oracle parity. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w).cast("long")
    val sumLen = aggregate(
      transform(w, x => length(x).cast("long")), lit(0L), (a, b) => a + b)
    val nAlpha = size(filter(w, x => x.rlike("[a-zA-Z]"))).cast("long")
    // '#' count by single-char strip; '...' runs by non-overlapping
    // left-to-right replace (both engines' replace semantics) — the
    // removed length is always a multiple of 3, so the div is exact
    val nHash = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val nEllipsis = ((length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / lit(3))
      .cast("long")
    val nStop = size(array_intersect(
      words(lower(col(textCol))), typedlit(GopherStopwords))).cast("long")
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(sumLen.cast("double") / nWords.cast("double"))
    val fracAlpha = when(nWords === 0, lit(0.0))
      .otherwise(nAlpha.cast("double") / nWords.cast("double"))
    val symRatio = when(nWords === 0, lit(0.0))
      .otherwise((nHash + nEllipsis).cast("double") / nWords.cast("double"))
    df.select(col(idCol),
        nWords.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(symRatio, 6).as("symbol_word_ratio"),
        round(fracAlpha, 6).as("frac_alpha_words"),
        nStop.as("n_req_stopwords"))
      .withColumn("pass_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("pass_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_symbol", col("symbol_word_ratio") <= 0.1)
      .withColumn("pass_alpha", col("frac_alpha_words") >= 0.8)
      .withColumn("pass_stopwords", col("n_req_stopwords") >= 2L)
      .withColumn("keep",
        col("pass_word_count") && col("pass_word_len") &&
          col("pass_symbol") && col("pass_alpha") && col("pass_stopwords"))
  }
}
