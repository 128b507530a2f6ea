package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Hash-spread per-document compute across the session's FULL shuffle
  * parallelism — with an EXPLICIT partition count.
  *
  * The r19 finding behind the explicitness: `.repartition(col)` with no
  * count is an AQE-OPTIMIZABLE exchange, and on a compact corpus (the
  * sf1 documents table is ~40 MB for 50k rows) AQE's partition
  * coalescing shrinks it right back to 1-2 partitions — re-serializing
  * the CPU-bound tokenize/shingle stage the spread was bought for.
  * Measured on q260: tokenize+posexplode was 5.5 s of an 11 s sf1 wall
  * on the coalesced exchange; an explicit count (user-specified, which
  * AQE honors) restores the full 32-way spread. The shuffled payload is
  * the raw text — tiny next to the token/shingle streams derived from
  * it, so pinning the count costs nothing even when the input is small.
  */
object Spread {

  def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Hash-repartition on `key` at the session's shuffle parallelism —
    * the layout per-doc windows/groupBys need anyway, at a width AQE
    * cannot coalesce away. */
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(numShufflePartitions(df), key)

  def byKey(df: DataFrame, keyCol: String): DataFrame =
    byKey(df, col(keyCol))
}
