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
}
