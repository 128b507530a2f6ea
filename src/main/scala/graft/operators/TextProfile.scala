package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-growth (Heaps' law) profiler — the corpus statistic that
  * says how fast NEW vocabulary keeps arriving as the corpus grows
  * (Heaps 1978: V(n) ≈ K·n^β). The curation uses: projecting tokenizer
  * OOV/vocab pressure before training a BPE, spotting a feed whose
  * vocabulary growth bends away from the corpus trend (machine-generated
  * text flattens; OCR noise steepens), and sizing dedup shingle spaces.
  *
  * The classic estimator needs nested prefixes of a RANDOM document
  * order — which naively is a global shuffle + global running distinct,
  * two corpus-scale sorts. This construction gets exact nested prefixes
  * with NO global order anywhere: the q92 seeded Knuth key assigns each
  * doc a uniform value in [0, 2³²), and prefix LEVEL b is "docs with
  * key bit-length ≤ b" — levels nest by construction (bitlen ≤ b ⊂
  * bitlen ≤ b+1), sizes double in expectation, and membership is a
  * narrow per-row expression. A term's ENTRY level is the min bit-length
  * over the docs containing it — one map-side-combined (term, min)
  * aggregate — and the curve is cumulative sums over the ≤ 32-row level
  * grid. Reported doc/token counts per level are EXACT (measured, not
  * expected), so the curve is self-describing.
  *
  * Scale shape: one tokenize pass into a (term → min level) aggregate
  * (the wordcount shuffle the index build already prices) + one narrow
  * per-doc level projection; the window runs on the 32-row grid. All
  * arithmetic integer → partitioning-invariant and SQL-replayable. */
object TextProfile {

  private val KnuthC = 2654435761L
  private val TwoTo31 = 2147483648L
  private val TwoTo32 = 4294967296L

  private def level(id: org.apache.spark.sql.Column, seed: Long) = {
    val mixed = pmod(id.cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    length(bin(pmod(mixed * KnuthC, lit(TwoTo32)))).cast("int")
  }

  /** (level, n_docs, n_tokens, vocab) — cumulative over the nested
    * random prefixes; one row per level present in the data. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  seed: Long = 0L): DataFrame = {
    val docs = df.select(col(idCol).as("__id"),
        filter(split(col(textCol), " "), w => w =!= "").as("__toks"))
      .select(col("__id"), col("__toks"), level(col("__id"), seed).as("__lvl"))
    val perLevelDocs = docs.groupBy(col("__lvl"))
      .agg(count(lit(1)).as("__d"), sum(size(col("__toks")).cast("long")).as("__t"))
    val entry = docs
      .select(col("__lvl"), explode(col("__toks")).as("__term"))
      .groupBy(col("__term")).agg(min(col("__lvl")).as("__flvl"))
      .groupBy(col("__flvl")).agg(count(lit(1)).as("__v"))
      .withColumnRenamed("__flvl", "__lvl")
    val w = Window.orderBy(col("__lvl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLevelDocs.join(entry, Seq("__lvl"), "full_outer")
      .na.fill(0L, Seq("__d", "__t", "__v"))
      .select(col("__lvl").as("level"),
        sum(col("__d")).over(w).as("n_docs"),
        sum(col("__t")).over(w).as("n_tokens"),
        sum(col("__v")).over(w).as("vocab"))
      .orderBy(col("level"))
  }

  /** Script-mix audit per group — the encoding-hygiene scalar the
    * lang-id heuristic (q44) cannot give: per source, what FRACTION of
    * characters are Latin letters, digits, whitespace, Cyrillic, CJK,
    * or other (the mojibake/markup bucket). A "English" feed whose
    * other-ratio climbs is emitting broken encodings or HTML entities;
    * a lang=zh source with cjk_ratio near 0 is mislabeled — both are
    * admission-filter signals upstream of any tokenizer.
    *
    * Character classes use EXPLICIT codepoint ranges (`[A-Za-z]`,
    * `[0-9]`, `[ \t\n\r]`, `[Ѐ-ӿ]`, `[一-鿿]`) so
    * Java regex and RE2 count identically — no \p{...} property
    * classes, whose tables differ across engines.
    *
    * Exactness: per-document counts are integers summed as BIGINTs;
    * the ratios are single closing divisions, 6-dp. One map-side
    * combined aggregate; the counters are codegen string expressions
    * evaluated in place (characters never leave their task). */
  def scriptMix(df: DataFrame, groupCol: String,
                textCol: String): DataFrame = {
    def cnt(pattern: String) =
      sum(regexp_count(col(textCol), lit(pattern)).cast("long"))
    val chars = sum(length(col(textCol)).cast("long"))
    def ratio(c: org.apache.spark.sql.Column) =
      round(c.cast("double") / col("chars").cast("double"), 6)
    df.filter(col(textCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), chars.as("chars"),
        cnt("[A-Za-z]").as("__lat"), cnt("[0-9]").as("__dig"),
        cnt("[ \\t\\n\\r]").as("__sp"), cnt("[Ѐ-ӿ]").as("__cyr"),
        cnt("[一-鿿]").as("__cjk"))
      .filter(col("chars") > 0)
      .select(col(groupCol), col("n_docs"), col("chars"),
        ratio(col("__lat")).as("latin_ratio"),
        ratio(col("__dig")).as("digit_ratio"),
        ratio(col("__sp")).as("space_ratio"),
        ratio(col("__cyr")).as("cyrillic_ratio"),
        ratio(col("__cjk")).as("cjk_ratio"),
        ratio(col("chars") - col("__lat") - col("__dig") - col("__sp") -
          col("__cyr") - col("__cjk")).as("other_ratio"))
      .orderBy(col(groupCol))
  }
}
