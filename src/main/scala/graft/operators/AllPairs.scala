package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs document cosine similarity over sparse tf·idf
  * vectors — the batch "find every similar pair" primitive behind
  * templated-page collapse, near-boilerplate clustering, and
  * duplicate-query mining (Bayardo, Ma, Srikant, "Scaling Up All Pairs
  * Similarity Search", WWW 2007 — the inverted-list formulation; their
  * prefix pruning is the same df-ordered lever as the engine's Jaccard
  * PPJoin, exposed here as the `maxDf` hot-term cut).
  *
  * Where the shingle operators ([[Dedup.ngramJaccardPairs]]) measure
  * SET overlap of n-grams, this measures WEIGHTED term-vector angle —
  * rare shared terms count more, so it catches same-topic/template
  * pairs whose exact wording diverged too far for shingles.
  *
  * Exactness discipline: weights are the engine's integer tf·idf
  * (w = tf · (bits(N) − bits(df)), the q90/q159 floor-log2 idiom), so
  * dot products and norms are EXACT BIGINTs; cosine = dot/(√na·√nb)
  * touches floating point only through IEEE-exact sqrt/mul/div — both
  * engines produce identical bits, making the pair set and rounded
  * scores oracle-hash-stable.
  *
  * Scale shape: candidate pairs come from ONE posting-list self-join
  * keyed by term (Σdf² bound — identical to the Jaccard join, and
  * ReuseExchange computes the weighted posting stream once); `maxDf`
  * drops terms above the df cap from BOTH the join and the norms
  * (similarity in the reduced term space — the standard stopword-cut
  * semantics, replayed identically by the oracle). The norm table is
  * doc-cardinality and joins in twice by id. */
object AllPairs {

  /** Directed-canonical pairs (a_id < b_id) with cosine ≥ threshold:
    * (a_id, b_id, dot, cos). */
  def cosinePairs(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double, maxDf: Option[Long] = None): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"bad threshold $threshold")
    val tf = KeywordRank.termFreq(df, idCol, textCol)
      .withColumnRenamed(idCol, "doc")
    val n = tf.select(col("doc")).distinct().count()
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val capped = maxDf match {
      case None => dfc
      case Some(cap) => dfc.filter(col("df") <= cap)
    }
    // integer weight per (doc, term); hot terms are absent entirely.
    // ZERO-weight terms (bits(N) == bits(df) — the idf floor for terms in
    // at least ~half the corpus) are dropped: they contribute 0 to every
    // dot and norm, and keeping them would give an all-stopword document
    // a zero norm (0/0 cosine) instead of no pairs at all.
    val w = tf.join(broadcast(capped), "term")
      .withColumn("w", col("tf") * (length(bin(lit(n))) - length(bin(col("df")))))
      .filter(col("w") > 0)
      .select(col("doc"), col("term"), col("w"))
    val norms = w.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nrm"))
    val dots = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.withColumnRenamed("doc", "a_id").withColumnRenamed("nrm", "na"), "a_id")
      .join(norms.withColumnRenamed("doc", "b_id").withColumnRenamed("nrm", "nb"), "b_id")
      // IEEE sqrt/mul/div on exact integers: deterministic bits. ONE
      // sqrt of the exact na·nb product (not √na·√nb) so identical
      // documents score exactly 1.0 — √n·√n ≠ n in doubles, √(n·n) = n
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("dot"), col("cos"))
  }
}
