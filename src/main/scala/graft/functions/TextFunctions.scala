package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline ops
  * (dedup, language ID, quality scoring, fingerprinting). Everything here
  * composes built-in codegen'd functions — no Scala UDFs in hot paths —
  * so Catalyst keeps whole-stage codegen across the pipeline.
  */
object TextFunctions {

  /** Seeded 64-bit hash column (xxhash64 with an explicit seed — the
    * public `xxhash64` fn hardcodes seed 42; MinHash needs k seeds). */
  def xxhash64Seeded(seed: Long, cols: Column*): Column =
    GraftSqlBridge.column(XxHash64(cols.map(GraftSqlBridge.expression), seed))

  /** Whitespace word split with empties dropped. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Word n-gram shingles: ["a b c", "b c d", ...]. Distinct not applied
    * (callers choose set vs bag semantics). */
  def shingles(text: Column, n: Int): Column = shinglesOf(words(text), n)

  /** As [[shingles]], over an already-split word array (lets callers
    * reuse one `words` computation across several signals). */
  def shinglesOf(w: Column, n: Int): Column =
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))

  /** SimHash-64 over word shingles: per bit, sum ±1 weighted by each
    * shingle-hash's bit; sign pattern packs into one long. */
  def simhash64(shingleCol: Column): Column = {
    val hashes = transform(shingleCol, s => xxhash64Seeded(7L, s))
    val bitSums = transform(sequence(lit(0), lit(63)), b =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)), (s, b) => struct(s.as("s"), b.as("b"))),
      lit(0L),
      (acc, x) => acc +
        when(x("s") > 0, call_function("shiftleft", lit(1L), x("b"))).otherwise(0L))
  }

  /** Hamming distance between two packed-64 simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two string arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(array_distinct(a)) + size(array_distinct(b))).cast("double") - inter
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** Rolling polynomial fingerprint over characters:
    * fold(acc*31 + code) mod 1e9+7 — stable across engines (exact integer
    * arithmetic; DuckDB mirror uses list_reduce). */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  // ---- language ID (stopword-score heuristic) ----

  /** (lang, stopwords) — tiny public stopword lists; scores are counts of
    * distinct stopwords present in the text. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "des", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3"))

  /** Per-language stopword score: |distinct words ∩ stoplist|. */
  def langScore(wordsCol: Column, lang: String): Column = {
    val stop = StopwordLists.toMap.apply(lang)
    size(array_intersect(wordsCol, typedlit(stop)))
  }

  /** argmax over language scores; ties broken alphabetically (langs are
    * evaluated in sorted order and `>` keeps the first maximum). */
  def langId(text: Column): Column = {
    val w = words(lower(text))
    val scored = StopwordLists.map { case (lang, _) => (lang, langScore(w, lang)) }
    scored.foldLeft((lit("und"), lit(0))) { case ((bestLang, bestScore), (lang, score)) =>
      (when(score > bestScore, lit(lang)).otherwise(bestLang),
        when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  // ---- quality scoring ----

  /** Heuristic document-quality features + composite score, all exact
    * integer/ratio arithmetic for oracle parity. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    val nWords = size(w)
    val nChars = length(text)
    val nAlnum = length(regexp_replace(text, "[^a-zA-Z0-9]", ""))
    val nStop = size(array_intersect(words(lower(text)),
      typedlit(StopwordLists.toMap.apply("en"))))
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> when(nWords === 0, 0.0)
        .otherwise(nAlnum.cast("double") / nWords.cast("double")),
      "alnum_ratio" -> when(nChars === 0, 0.0)
        .otherwise(nAlnum.cast("double") / nChars.cast("double")),
      "stopword_hits" -> nStop)
  }
}
