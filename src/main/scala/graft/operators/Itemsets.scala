package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent itemset pairs with association metrics — Apriori level 2
  * (Agrawal & Srikant 1994) over (basket, item) rows: which items
  * co-occur beyond chance. The corpus-curation reading: baskets are
  * documents and items are sources/tags/entities ("which two entity
  * types co-occur in a page"); the classic reading is market baskets.
  * q164's PMI ranks token BIGRAMS (adjacent positions); this ranks
  * SET co-occurrence within a basket regardless of position — a
  * different operator with a different pair space.
  *
  * Per surviving pair (a < b): co-occurrence count, item supports,
  * confidence(a→b) = c_ab/c_a and lift = c_ab·N/(c_a·c_b) — all exact
  * BIGINT counts with single closing divisions (cross-engine
  * bit-stable).
  *
  * Scale shape: dedup to distinct (basket, item) (one shuffle), then
  * the pair space is the within-basket self-join Σ|basket|² — never
  * n² — and pairs aggregate map-side-combined. `maxItemDf` is the hot-
  * item lever (the q41 `maxDf` discipline): an item in every basket
  * contributes |baskets| pair rows per partner and zero signal; cap
  * it and the pair space is bounded by Σ min(df, cap)·|basket|.
  * minSupport prunes BEFORE the metric joins, so the support join
  * touches only surviving pairs. */
object Itemsets {

  /** (item_a, item_b, n_pair, n_a, n_b, conf, lift) for pairs with
    * co-occurrence ≥ minSupport; items with df > maxItemDf (when set)
    * are excluded loudly via the returned frame's lineage (their
    * pairs simply don't appear — count them with `hotItems`). */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, maxItemDf: Option[Long] = None): DataFrame = {
    val items = df.select(col(basketCol).as("o"), col(itemCol).as("i")).distinct()
    val cnt = items.groupBy(col("i")).agg(count(lit(1)).as("c"))
    val kept = maxItemDf.fold(items) { cap =>
      // Broadcast the HOT side: items with df > cap are by construction few
      // (each costs > cap rows of the corpus, so there are < n/cap of them)
      // while the kept vocabulary is nearly everything — broadcasting the
      // kept set would ship the whole vocab to every task and OOM the
      // driver at web-scale. left_anti against the tiny hot set is the
      // same semantics with a kB-sized broadcast.
      items.join(broadcast(cnt.filter(col("c") > cap).select(col("i"))), Seq("i"), "left_anti")
    }
    val nBaskets = items.agg(countDistinct(col("o")).as("__nb")) // one row, lazy
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.o") === col("b.o") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs
      .join(cnt.withColumnRenamed("i", "item_a").withColumnRenamed("c", "n_a"), "item_a")
      .join(cnt.withColumnRenamed("i", "item_b").withColumnRenamed("c", "n_b"), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"), col("n_b"),
        (col("n_pair").cast("double") / col("n_a").cast("double")).as("conf"),
        ((col("n_pair") * col("__nb")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** The items a `maxItemDf` cap would drop, with their df — the loud
    * accounting face of the lever. */
  def hotItems(df: DataFrame, basketCol: String, itemCol: String,
               maxItemDf: Long): DataFrame =
    df.select(col(basketCol).as("o"), col(itemCol).as("i")).distinct()
      .groupBy(col("i")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxItemDf)
}
