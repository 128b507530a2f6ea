package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Reusable Bloom-filter semi-join pruning: build the filter over a key
  * set ONCE, then cut fact-scan rows before they reach any shuffle.
  *
  * Spark's own runtime row-level filtering plans this shape
  * automatically inside one query and then throws the filter away; a
  * curation pipeline wants the filter as a VALUE — built once over the
  * standing corpus keys (e.g. already-ingested doc ids) and applied to
  * every incremental batch across many queries, the way
  * [[Dedup]]'s incremental path scans the corpus narrowly per batch.
  * At 100 TB the win is shuffle bytes: a kB–MB broadcast sketch drops
  * the non-matching fact rows AT THE SCAN, so the join's Exchange
  * carries only (true matches + fpp·n) rows.
  *
  * Correctness contract: pruning is sound-only-negative (no false
  * negatives, fpp false positives), so it composes with an EXACT join
  * downstream — results are identical to the unpruned plan by
  * construction, which is exactly how the gate query oracles it (the
  * same physical-property-not-answer pattern as [[SaltedJoin]]).
  *
  * The probe is Spark's codegen [[BloomFilterMightContain]] expression
  * over a binary literal — the identical kernel the built-in runtime
  * filter uses, so the scan stays in whole-stage codegen; build uses
  * the distributed `stat.bloomFilter` aggregate (per-partition filters,
  * driver merge; the sketch, never the keys, moves).
  */
object BloomPrune {

  /** Distributed build over a (long-typed) key column. */
  def build(keys: DataFrame, keyCol: String, expectedItems: Long,
            fpp: Double = 0.01): BloomFilter =
    keys.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Codegen membership probe usable in any filter/select. */
  def mightContain(bf: BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      GraftSqlBridge.expression(key.cast("long"))))
  }

  /** The full pruned-equi-join convenience: prune `fact` on the Bloom
    * filter of `dim`'s keys, then exact-join — same answer as the plain
    * join, shuffle carries only survivors. `expectedItems` defaults to
    * a cheap dim count (one narrow pass over the small side). */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, fpp: Double = 0.01,
                 expectedItems: Long = -1L): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else math.max(64L, dim.count())
    val bf = build(dim.select(col(dimKey)), dimKey, n, fpp)
    fact.filter(mightContain(bf, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
