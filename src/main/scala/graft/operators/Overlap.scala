package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions.shingle_hashes

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
}
