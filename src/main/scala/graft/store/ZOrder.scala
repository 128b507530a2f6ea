package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several columns'
  * normalized ranks so ONE physical sort key localizes ALL of them —
  * the multi-column generalization of the linear clustering
  * [[DocumentStore.readRange]] prunes on (q105 clusters by one column;
  * a range on any OTHER column then reads everything). After z-order
  * layout, each partition covers an orthant of the value space, so its
  * min/max sidecar stats are tight on EVERY participating column and
  * `readWhere` prunes on any of them — the OPTIMIZE ZORDER layout of
  * lakehouse tables, built from plain Catalyst bit arithmetic.
  *
  * Mechanics: per column, values normalize to a `bits`-wide integer
  * rank via driver-fetched min/max (one narrow agg pass; layout only —
  * correctness never depends on the normalization because readers
  * re-filter), then round-robin bit interleave: bit j of column i lands
  * at z position j·n + i. Per-column width is min(16, 62/n) bits, so
  * the z-value always fits a non-negative long (2 cols → 32 z bits,
  * identical to the classic 2×16 Morton code; 3 cols → 48; 4 → 60).
  * Fixed-width bucket = top log2Buckets bits of z: no sampling, so the
  * layout is deterministic for a given dataset. Everything is codegen
  * integer ops — no UDFs in the write path.
  */
object ZOrder {

  /** Adds `zval` (round-robin interleaved Morton code over `cols`, in
    * listed order) and `zbucket` (its top log2Buckets bits) for any
    * list of 2+ numeric columns — the arbitrary-column-list form
    * lakehouse OPTIMIZE ZORDER takes. */
  def withZBucket(df: DataFrame, cols: Seq[String], log2Buckets: Int): DataFrame = {
    val n = cols.size
    require(n >= 2, s"z-order needs at least 2 columns, got $cols")
    val bits = math.min(16, 62 / n)
    val zwidth = n * bits
    require(log2Buckets >= 1 && log2Buckets <= math.min(16, zwidth),
      s"bad log2Buckets=$log2Buckets for $n columns ($zwidth z bits)")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val scale = 1L << bits
    def rank(c: String, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(floor((col(c).cast("double") - lit(lo)) / lit(span) * scale).cast("long"),
        lit(scale - 1))
    }
    // materialize ranks once as working columns: the interleave reads
    // each rank `bits` times, and duplicating the rank expression that
    // many times would bloat the codegen tree for nothing
    val ranked = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zr$i", rank(c, mm.getDouble(2 * i), mm.getDouble(2 * i + 1)))
    }
    def interleave(i: Int): Column =
      (0 until bits).map { j =>
        shiftleft(shiftrightunsigned(col(s"__zr$i"), j).bitwiseAND(lit(1L)), j * n + i)
      }.reduce(_ bitwiseOR _)
    ranked
      .withColumn("zval", (0 until n).map(interleave).reduce(_ bitwiseOR _))
      .withColumn("zbucket", shiftrightunsigned(col("zval"), zwidth - log2Buckets))
      .drop((0 until n).map(i => s"__zr$i"): _*)
  }

  /** Two-column form (the classic 2×16-bit Morton code). */
  def withZBucket(df: DataFrame, colA: String, colB: String,
                  log2Buckets: Int): DataFrame =
    withZBucket(df, Seq(colA, colB), log2Buckets)
}
