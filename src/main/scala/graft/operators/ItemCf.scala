package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item collaborative-filtering cosine over basket co-occurrence
  * (Sarwar et al. 2001) — the recommender primitive the suite's other
  * similarity operators deliberately are not: q169's all-pairs cosine
  * compares CONTENT (tf·idf term vectors), the k-NN family compares
  * embeddings; this one says "bought together": cos(i,j) =
  * n_ij/√(n_i·n_j) over the binary basket-membership vectors, which is
  * the exact cosine of those 0/1 columns computed WITHOUT materializing
  * them.
  *
  * Exactness: per-item basket counts and pair co-occurrence counts are
  * exact BIGINTs off (basket, item) distinct rows; the cosine is one
  * closing division per surviving pair; the published top-k orders by
  * (cosine DESC, item_a, item_b) — a total order, replayable.
  *
  * Scale shape: the pair space is the basket self-join, bounded by
  * Σ|basket|² (the q188/q358 co-purchase family's cost, NOT n² over
  * items); item counts broadcast back onto the pair aggregate, and the
  * global top-k is one TakeOrderedAndProject. At 100 TB the standard
  * levers apply unchanged: cap basket size (a 10⁶-item basket is a
  * crawler, not a customer) and min-support-filter items before the
  * join — both metadata-cheap pre-filters, neither changes surviving
  * pairs' cosines. */
object ItemCf {

  /** Top-k rows: (item_a, item_b, n_a, n_b, n_both, cosine). */
  def itemCosine(df: DataFrame, basketCol: String, itemCol: String,
                 topK: Int, minSupport: Long = 1L): DataFrame = {
    require(topK >= 1 && topK <= 10000, s"itemCosine: topK=$topK")
    require(minSupport >= 1, s"itemCosine: minSupport=$minSupport")
    val bi = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).cast("long").as("__i"))
      .distinct()
    Pinned.withCheckpoint(bi) { rows =>
      val counts = rows.groupBy(col("__i"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= minSupport)
      val kept = rows.join(broadcast(counts).select(col("__i")), "__i")
      val pairs = kept.as("x")
        .join(kept.as("y"),
          col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
        .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
        .agg(count(lit(1)).as("n_both"))
      val out = pairs
        .join(broadcast(counts)
          .select(col("__i").as("item_a"), col("__n").as("n_a")), "item_a")
        .join(broadcast(counts)
          .select(col("__i").as("item_b"), col("__n").as("n_b")), "item_b")
        .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
          col("n_both"),
          round(col("n_both").cast("double") /
            sqrt(col("n_a").cast("double") * col("n_b").cast("double")),
            6).as("cosine"))
        .orderBy(col("cosine").desc, col("item_a"), col("item_b"))
        .limit(topK)
      // the pin releases when this block returns: re-emit the top-k
      // driver-side so no lazy plan outlives the checkpoint
      Grids.collectBounded(out, "itemCosine top-k", maxRows = topK)
    }
  }
}
