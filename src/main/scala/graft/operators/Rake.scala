package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010) — multi-word keyphrases
  * from stopword-delimited candidate runs, the unsupervised companion
  * to q164's PMI collocations: PMI finds statistically-glued bigrams
  * corpus-wide; RAKE surfaces the content phrases ("support vector
  * machine") that stopword boundaries carve out, scoring words by
  * degree/frequency so words that live inside LONG phrases outrank
  * equally-frequent solo words. The curation uses: corpus topic
  * inventory, per-source keyword drift, and query-expansion seeds
  * (q239) that aren't single tokens.
  *
  * Construction (all exact integers until the closing scores):
  *   1. tokenize with positions (one narrow pass);
  *   2. phrase id = running count of stopword/boundary hits per doc —
  *    a per-DOC window (partitioned by doc_id, never global);
  *   3. per-word freq and degree (Σ phrase length over its phrases —
  *    the co-occurrence degree including self);
  *   4. word score = deg/freq (single division); phrase score = Σ
  *    word scores folded in WORD-POSITION order (sorted-struct fold);
  *   5. group identical phrase texts, rank by (rounded score, phrase).
  *
  * Scale shape: tokenize + two vocabulary-bounded aggregates + one
  * phrase-keyed aggregate — the wordcount cost class; no corpus²
  * anywhere. Output bounded by `topN`. */
object Rake {

  /** English RAKE stopwords — the engine's lang-id list
    * ([[graft.functions.TextFunctions.StopwordLists]]), shared with
    * the oracle as literals. */
  val Stopwords: Seq[String] =
    graft.functions.TextFunctions.StopwordLists.toMap.apply("en")

  /** Top keyphrases: (phrase, n_words, n_occurrences, score). */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               topN: Int = 20, maxPhraseWords: Int = 4): DataFrame = {
    require(topN >= 1 && maxPhraseWords >= 1, s"bad topN/maxPhraseWords")
    // punctuation is a PHRASE BOUNDARY, not whitespace: a bare
    // [^a-z0-9]+ split would fuse "descent, stochastic" into one run.
    // Punctuation runs become a sentinel '.' token (never a word — '.'
    // can't match [a-z0-9]+), which the stop flag then treats exactly
    // like a stopword. Compiled scan, not regexp_replace: java.util.regex
    // replacement measured ~0.3 MB/s/core here — 4.5 s of q260's sf1
    // wall (r19); the compiled pass is equality-specced against the
    // regexp form, so the oracle's regexp_replace replay is unchanged.
    val cleaned = graft.functions.TextExpressions.punct_to_dot(lower(col(textCol)))
    // spread BEFORE the tokenize: a compact parquet input is one split,
    // and without this the regexp + posexplode serialize on one core
    // (the r18 q299 finding); the id-hash layout is the same one the
    // per-doc window needs, so the exchange is not an extra shuffle.
    // EXPLICIT count (r19): the un-numbered form was AQE-coalesced back
    // to ~1 task at sf1 — 5.5 s of tokenize on one core
    val toks = Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("__id"),
        posexplode(split(cleaned, " ")).as(Seq("__pos", "__w")))
      .withColumn("__stop",
        col("__w") === "" || col("__w") === "." ||
          col("__w").isin(Stopwords: _*))
    val wd = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val runs = toks
      .withColumn("__run", sum(when(col("__stop"), 1L).otherwise(0L)).over(wd))
      .filter(!col("__stop"))
    val phrases = runs.groupBy(col("__id"), col("__run"))
      .agg(count(lit(1)).as("__len"),
        array_join(transform(array_sort(collect_list(
          struct(col("__pos"), col("__w")))), s => s.getField("__w")), " ")
          .as("phrase"))
      .filter(col("__len") <= maxPhraseWords)
    // word stats over phrase INSTANCES: freq = occurrences across all
    // phrases, degree = Σ length of phrases containing the word (self
    // included — the RAKE co-occurrence degree)
    val wordStats = phrases
      .select(col("__len"), explode(split(col("phrase"), " ")).as("__w"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .withColumn("__score",
        col("__deg").cast("double") / col("__freq").cast("double"))
    // one row per DISTINCT phrase text (same text ⇒ same word multiset
    // ⇒ same score — scoring instances would double-fold duplicates)
    val distinctPhrases = phrases.groupBy(col("phrase"))
      .agg(max(col("__len")).as("n_words"),
        count(lit(1)).as("n_occurrences"))
    val scored = distinctPhrases
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        posexplode(split(col("phrase"), " ")).as(Seq("__i", "__w2")))
      .join(wordStats, col("__w2") === col("__w"))
      .groupBy(col("phrase"), col("n_words"), col("n_occurrences"))
      .agg(aggregate(transform(array_sort(collect_list(
          struct(col("__i"), col("__score")))), s => s.getField("__score")),
        lit(0.0), (acc, x) => acc + x).as("__pscore"))
    scored
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        round(col("__pscore"), 6).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topN)
  }
}
