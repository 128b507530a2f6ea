package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram collocation mining by pointwise mutual information — the
  * corpus-statistics pass that surfaces multi-word units ("new york",
  * "machine learning") for tokenizer vocab curation, stopword-phrase
  * filters, and quality heuristics (Church & Hanks, "Word Association
  * Norms, Mutual Information, and Lexicography", Comp. Ling. 1990).
  *
  * PMI(w1,w2) = log P(w1w2) / (P(w1)·P(w2)) with P(w1w2) = n12/B over
  * adjacent-bigram space and P(w) = n/T over token space. The emitted
  * score is the LIFT ratio n12·T²/(B·n1·n2) (PMI's argument — same
  * ranking, no transcendental): computed as one pinned IEEE double
  * expression `(n12·T·T)/(B·n1·n2)` that any engine replays bit-for-bit
  * (multiply/divide are exact-rounded; association order is fixed), so
  * the rounded score is oracle-hash-stable — unlike log, whose libm
  * varies across engines.
  *
  * Scale shape: the corpus is tokenized in two NARROW passes (unigrams,
  * zipped adjacent bigrams — Catalyst does not fuse the two Generates,
  * same fact as q96's audit); both aggregates are map-side-combined and
  * their outputs are VOCABULARY-bounded (Zipf: distinct bigrams ≪ token
  * occurrences). The unigram table joins in twice via broadcast at
  * moderate vocab (AQE demotes to shuffle joins past the threshold);
  * the totals are one-row relations cross-joined lazily — the whole
  * plan is a single lazy tree, no driver-side scalars. */
object Collocations {

  private def words(textCol: Column): Column =
    filter(split(textCol, " "), w => w =!= "")

  /** Scored adjacent-bigram table: (w1, w2, n12, n1, n2, lift) for all
    * bigrams with n12 ≥ minCount. `lift` > 1 means the pair co-occurs
    * more than independence predicts (log2(lift) = PMI bits). */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, "minCount must be at least 1")
    val w = df.select(words(col(textCol)).as("w"))
    val uni = w.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val bi = w.filter(size(col("w")) >= 2)
      .select(explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n12"))
    val totT = uni.agg(sum(col("n")).as("tot_t"))    // one row
    val totB = bi.agg(sum(col("n12")).as("tot_b"))   // one row
    bi.filter(col("n12") >= minCount)
      .join(broadcast(uni.withColumnRenamed("t", "w1").withColumnRenamed("n", "n1")), "w1")
      .join(broadcast(uni.withColumnRenamed("t", "w2").withColumnRenamed("n", "n2")), "w2")
      .crossJoin(broadcast(totT))
      .crossJoin(broadcast(totB))
      // pinned association order — must match the SQL oracle verbatim:
      // (n12 * T * T) / (B * n1 * n2), all doubles, left-assoc
      .withColumn("lift",
        (col("n12").cast("double") * col("tot_t") * col("tot_t")) /
          (col("tot_b").cast("double") * col("n1") * col("n2")))
      .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"), col("lift"))
  }
}
