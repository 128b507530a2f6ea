package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several columns'
  * normalized ranks so ONE physical sort key localizes ALL of them —
  * the multi-column generalization of the linear clustering
  * [[DocumentStore.readRange]] prunes on (q105 clusters by one column;
  * a range on any OTHER column then reads everything). After z-order
  * layout, each partition covers a quadrant of the value space, so its
  * min/max sidecar stats are tight on EVERY participating column and
  * `readWhere` prunes on any of them — the OPTIMIZE ZORDER layout of
  * lakehouse tables, built from plain Catalyst bit arithmetic.
  *
  * Mechanics: per column, values normalize to a `bits`-wide integer
  * rank via driver-fetched min/max (one narrow agg pass; layout only —
  * correctness never depends on the normalization because readers
  * re-filter), then the classic shift-mask spread interleaves them into
  * the z-value. Fixed-width bucket = top log2(buckets) bits of z: no
  * sampling, so the layout is deterministic for a given dataset.
  * Everything is codegen integer ops — no UDFs in the write path.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (Morton). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Adds `zval` (interleaved 2×16-bit Morton code) and `zbucket`
    * (its top log2Buckets bits) for two numeric columns. */
  def withZBucket(df: DataFrame, colA: String, colB: String,
                  log2Buckets: Int): DataFrame = {
    require(log2Buckets >= 1 && log2Buckets <= 16, s"bad log2Buckets=$log2Buckets")
    val mm = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    def rank(c: String, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(floor((col(c).cast("double") - lit(lo)) / lit(span) * 65536).cast("long"),
        lit(65535L))
    }
    df.withColumn("zval",
        spread16(rank(colA, mm.getDouble(0), mm.getDouble(1)))
          .bitwiseOR(shiftleft(spread16(rank(colB, mm.getDouble(2), mm.getDouble(3))), 1)))
      .withColumn("zbucket", shiftrightunsigned(col("zval"), 32 - log2Buckets))
  }
}
