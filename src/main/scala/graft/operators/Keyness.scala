package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dunning log-likelihood keyness (Dunning 1993) — "which words
  * characterize THIS source against the rest of the corpus": for each
  * (source, word), the G² statistic of the 2×2 contingency table
  *
  *   a = count(word, source)      b = count(word, rest)
  *   c = other tokens in source   d = other tokens in rest
  *
  * G² = 2·Σ O·ln(O/E) over the four cells (E from the margins). Where
  * [[Collocations.pmiBigrams]] scores word-word affinity and
  * [[Association.chiSquare]] tests a whole table, keyness ranks the
  * per-source vocabulary — the provenance/templating read ("this
  * source is the one that says 'subscribe'") that a corpus-mix audit
  * wants per word, robust at low counts where PMI explodes. Signed by
  * over/under-use: positive G² rows here are over-used (a/c > b/d);
  * under-used words rank low by construction of the top-k.
  *
  * Exactness: all four cells and both margins are exact BIGINT
  * censuses (one tokenize + one (source, word) count pass); the four
  * O·ln(O/E) terms close per row in a fixed double tree (ln replay —
  * the q376/q395 log-parity precedent), zero-count cells contribute 0
  * by the x·ln(x) → 0 limit. Output: top `k` over-used words per
  * source by (G² desc, word asc).
  *
  * Scale shape: one corpus tokenize + one map-side-combined
  * (source, word) census; margins are two small rollups; the top-k is
  * a per-source bounded window over vocabulary rows. */
object Keyness {

  def keynessG2(df: DataFrame, groupCol: String, textCol: String,
                k: Int = 5, minCount: Long = 5L): DataFrame = {
    require(k >= 1 && k <= 100, s"keynessG2: k=$k outside [1, 100]")
    val toks = df.filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("__w"))
    val cells = toks.groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).as("__a"))
    val wordTot = cells.groupBy(col("__w"))
      .agg(sum(col("__a")).as("__wt"))
    val grpTot = cells.groupBy(col("__g")).agg(sum(col("__a")).as("__gt"))
    val nTot = cells.agg(coalesce(sum(col("__a")), lit(0L))).head().getLong(0)
    require(nTot >= 2, s"keynessG2: corpus has $nTot tokens")
    // x·ln(x/e) with the 0·ln 0 = 0 limit, in one fixed expression
    def xlnxe(x: org.apache.spark.sql.Column,
              e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(x > 0, x.cast("double") * log(x.cast("double") / e)).otherwise(lit(0.0))
    val scored = cells.filter(col("__a") >= minCount)
      .join(broadcast(wordTot), "__w")
      .join(broadcast(grpTot), "__g")
      .withColumn("__b", col("__wt") - col("__a"))
      .withColumn("__c", col("__gt") - col("__a"))
      .withColumn("__d", lit(nTot) - col("__wt") - col("__c"))
      // expected cells from the margins, each a double once
      .withColumn("__ea", col("__wt").cast("double") * col("__gt").cast("double") / lit(nTot.toDouble))
      .withColumn("__eb", col("__wt").cast("double") * (lit(nTot.toDouble) - col("__gt").cast("double")) / lit(nTot.toDouble))
      .withColumn("__ec", (lit(nTot.toDouble) - col("__wt").cast("double")) * col("__gt").cast("double") / lit(nTot.toDouble))
      .withColumn("__ed", (lit(nTot.toDouble) - col("__wt").cast("double")) * (lit(nTot.toDouble) - col("__gt").cast("double")) / lit(nTot.toDouble))
      .withColumn("__g2", lit(2.0) * (xlnxe(col("__a"), col("__ea")) +
        xlnxe(col("__b"), col("__eb")) + xlnxe(col("__c"), col("__ec")) +
        xlnxe(col("__d"), col("__ed"))))
      // over-used in this source only (the keyword direction)
      .filter(col("__a").cast("double") * (lit(nTot.toDouble) - col("__gt").cast("double")) >
        col("__b").cast("double") * col("__gt").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__g2").desc, col("__w"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__g").as(groupCol), col("__rk").as("rank"),
        col("__w").as("word"), col("__a").as("n_in"), col("__b").as("n_rest"),
        round(col("__g2"), 6).as("g2"))
      .orderBy(col(groupCol), col("rank"))
  }
}
