package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the entity-resolution primitive
  * (Fellegi & Sunter 1969 decision model, standard blocking-then-verify
  * architecture): candidate pairs share a cheap BLOCK KEY (first token,
  * token count, a phonetic code…), and only candidates pay the
  * edit-distance verify. The reference's surface has the probe-side
  * cousin (q39: one string vs a table); this is the pairwise form a
  * catalog/corpus dedup actually needs — "which records are the same
  * entity spelled differently".
  *
  * Scale shape: the self-join shuffles each side once on the block key,
  * and the pair space is Σ|block|² — never n² (the q35/q41 blocking
  * discipline). The caller owns the block key's selectivity; a hot
  * block is visible in `n_block` and fixable by tightening the key
  * (add token count, add a length bucket) exactly like `maxDf` bounds
  * the Jaccard join. The verify uses Spark's threshold-bounded
  * levenshtein (banded DP: cost O(maxDist·len), early exit — the
  * standard edit-distance cutoff optimization) so a non-match costs
  * the band, not the full matrix.
  */
object Linkage {

  /** Candidate pairs (id_a < id_b) sharing `blockKey`, with exact edit
    * distance ≤ `maxDist`. Columns: id_a, id_b, dist. */
  def blockedPairs(df: DataFrame, idCol: String, strCol: String,
                   blockKey: Column, maxDist: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("__sa"),
      blockKey.as("__bk"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("__sb"),
      blockKey.as("__bk"))
    a.join(b, "__bk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0) // threshold form returns -1 past the band
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Per-record linkage summary — the bounded (n-row) face of the pair
    * join: candidates seen, matches within `maxDist`, and the
    * deterministic best match (min dist, ties to the smallest id,
    * encoded as dist·idSpan + id so MIN picks lexicographically).
    * Records with no block partner report 0/0/NULL/NULL. */
  def bestMatch(df: DataFrame, idCol: String, strCol: String,
                blockKey: Column, maxDist: Int,
                idSpan: Long = 10000000L): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("__sa"),
      blockKey.as("__bk"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("__sb"),
      blockKey.as("__bk"))
    // the min-encoding is only injective for ids in [0, idSpan): fail
    // loudly in-plan (the PageRank NULL-weight discipline) instead of
    // silently corrupting best_dist/best_id — the check lives INSIDE
    // the encoded expression so it cannot be pruned away
    val checkedId = when(col("id_b") >= idSpan || col("id_b") < 0,
      raise_error(concat(lit(s"Linkage.bestMatch: id out of [0, $idSpan): "),
        col("id_b").cast("string"))))
      .otherwise(col("id_b"))
    val agg = a.join(b, "__bk")
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .groupBy(col("id_a"))
      .agg(count(lit(1)).as("n_block"),
        sum(when(col("dist") >= 0, 1L).otherwise(0L)).as("n_match"),
        min(when(col("dist") >= 0, col("dist") * idSpan + checkedId))
          .as("__best"))
    df.select(col(idCol).as("id"))
      .join(agg, col("id") === col("id_a"), "left")
      .select(col("id"),
        coalesce(col("n_block"), lit(0L)).as("n_block"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        (col("__best") - pmod(col("__best"), lit(idSpan))).cast("long")
          ./(idSpan).cast("long").as("best_dist"), // exact integer div
        pmod(col("__best"), lit(idSpan)).cast("long").as("best_id"))
  }
}
