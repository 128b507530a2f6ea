package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions.shingle_hashes
import graft.functions.TextFunctions.shingles

/** Cross-source contamination matrix — how much CONTENT two sources
  * share, pairwise: the provenance audit a corpus assembled from many
  * feeds needs before training (mirrors and scrapes re-serve each
  * other's pages, and a benchmark feed leaking into a train feed is the
  * q83 decontamination failure at the SOURCE level, where it can be
  * caught wholesale instead of document by document).
  *
  * Granularity is the caller's: `n = 0` counts whole-document exact
  * duplicates across sources; `n ≥ 1` counts shared distinct word
  * n-grams (the q83 leakage currency — catches partial copying and
  * shared boilerplate that whole-document equality misses).
  *
  * For every unordered source pair (a < b): shared distinct keys, each
  * side's distinct-key total, and the overlap coefficient
  * shared/min(na, nb) (Szymkiewicz–Simpson).
  *
  * Scale shape: content reduces to 8-byte hashes in one
  * map-side-combined distinct aggregate (the q40 exact-dedup shuffle
  * shape); the per-key source SET is bounded by the source count, so
  * the pair explosion is Σ\|sources-per-key\|² ≤ keys·(#sources)² —
  * never rows²; the matrix itself is (#sources choose 2) rows. */
object Overlap {

  def sourceOverlap(df: DataFrame, contentCol: String, sourceCol: String,
                    n: Int = 0): DataFrame = {
    require(n >= 0, s"bad shingle size $n")
    val keyed =
      if (n == 0) df.select(xxhash64(col(contentCol)).as("__h"),
        col(sourceCol).as("__s"))
      else df.select(explode(shingle_hashes(col(contentCol), n)).as("__h"),
        col(sourceCol).as("__s"))
    val perKey = keyed.distinct()
      .groupBy(col("__h"))
      .agg(sort_array(collect_set(col("__s"))).as("__ss"))
    val perSource = perKey
      .select(explode(col("__ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_distinct"))
    val pairs = perKey
      .select(explode(col("__ss")).as("source_a"), col("__ss"))
      .select(col("source_a"), explode(col("__ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(perSource.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n_distinct", "na")), "source_a")
      .join(broadcast(perSource.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n_distinct", "nb")), "source_b")
      .withColumn("overlap",
        col("shared").cast("double") / least(col("na"), col("nb")).cast("double"))
      .select(col("source_a"), col("source_b"), col("shared"),
        col("na"), col("nb"), col("overlap"))
  }

  /** Sketched contamination matrix — the bounded-state path for
    * [[sourceOverlap]] at corpus scale. The exact matrix's only
    * corpus-scale stage is the distinct-shingle shuffle; the sketch
    * replaces it with a k-minimum-values signature per source (Beyer et
    * al. SIGMOD 2007; bottom-k = the mergeable primitive q157 already
    * proves): keep each source's k smallest deterministic shingle
    * hashes, and estimate pairwise Jaccard from the merged signatures.
    *
    * Estimator (exact-arithmetic form of KMV): for a pair (A, B), rank
    * the UNION of the two signatures and keep its k smallest;
    * `est = |{h ∈ bottom-k(A∪B) : h ∈ sig(A) ∧ h ∈ sig(B)}| / k`.
    * Membership in the signature IS membership in the full set for
    * every h that survives the union cut — if h ∈ A lay outside A's
    * bottom-k, then A alone holds k smaller hashes, all of which are in
    * the union, so h cannot be in bottom-k(A∪B). Hence the numerator
    * counts exactly \|bottom-k(A∪B) ∩ A ∩ B\| — the textbook KMV
    * Jaccard estimator, computed purely from the two signatures. When
    * the union has fewer than k distinct hashes the estimate is the
    * EXACT Jaccard of the hashed shingle sets.
    *
    * Determinism: the hash is the engine's replayable polynomial→Knuth
    * stack (q177), so the sketch — and therefore the estimate — is
    * bit-reproducible on any partitioning and in any engine (the oracle
    * replays it hash-exact). Polynomial collisions (mod 1e9+7) merge a
    * vanishing fraction of shingles identically in every replay; they
    * perturb the estimand, never reproducibility.
    *
    * Scale shape: one narrow shingle explode + a (source, h) distinct,
    * then `row_number ≤ k` per source — `WindowGroupLimit` forwards
    * only each task's local bottom-k below the exchange (the q157/q166
    * plan fact), so the shuffle carries ≤ k·sources·tasks rows instead
    * of the corpus's distinct shingles. Everything after the signature
    * table is (#sources choose 2)·2k rows — metadata scale. Output:
    * (source_a, source_b, k_union, in_both, est_jaccard). */
  def sketchOverlap(df: DataFrame, contentCol: String, sourceCol: String,
                    n: Int = 3, k: Int = 64): DataFrame = {
    require(n >= 1, s"bad shingle size $n")
    require(k >= 1, s"bad sketch size $k")
    val keyCol = pmod(
      pmod(Splits.stringKey(col("__sh")), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
    val sk = df
      .select(col(sourceCol).as("source"),
        explode(shingles(col(contentCol), n)).as("__sh"))
      .select(col("source"), keyCol.as("h"))
      .distinct()
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("__rk") <= k)
      .select(col("source"), col("h"))
    val srcs = sk.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("sa"))
      .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
    val ua = pairs.join(sk.withColumnRenamed("source", "sa"), "sa")
      .select(col("sa"), col("sb"), col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
    val ub = pairs.join(sk.withColumnRenamed("source", "sb"), "sb")
      .select(col("sa"), col("sb"), col("h"), lit(0L).as("ia"), lit(1L).as("ib"))
    ua.unionByName(ub)
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("__rk") <= k)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("k_union"), sum(col("ia") * col("ib")).as("in_both"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("k_union"), col("in_both"),
        round(col("in_both").cast("double") / col("k_union"), 6).as("est_jaccard"))
  }
}
