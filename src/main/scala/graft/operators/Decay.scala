package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregates — the recency-weighted score
  * every engagement/freshness ranking uses (half-life decay: an event
  * `h` half-lives old counts half). The exactness trick: with a
  * half-life measured in whole periods and ages clamped to `maxAge`
  * periods, the weight 2^(−age) is DYADIC — so instead of summing
  * doubles (order-dependent, partitioning-dependent), the engine sums
  * value·2^(maxAge−age) in exact DECIMAL(38,2) (value enters through
  * the established double→DECIMAL(18,2) cast idiom) and divides the
  * TOTAL by 2^maxAge once at the end. Both steps — decimal→double
  * (correctly rounded) and division by a power of two (exact scaling)
  * — are bit-identical in any IEEE engine, so the decayed score
  * replays exactly despite being "floating point".
  *
  * Scale shape: one narrow projection (age, shift, scaled value) into
  * a map-side-combined group aggregate — a single shuffle carrying one
  * decimal per group per task. The reference timestamp is an aggregate
  * broadcast, not driver state. maxAge bounds the dynamic range:
  * 2^maxAge·Σ|value| must fit DECIMAL(38,2) — maxAge ≤ 40 leaves
  * 10¹⁸ of value headroom; older events contribute at the floor
  * weight (their signal is gone anyway — that is the point of decay).
  */
object Decay {

  /** (groupCol, n, decayed) where decayed = Σ value·2^(−agePeriods)
    * and age is whole `periodDays`-day periods before the corpus max
    * timestamp, clamped to `maxAge`. */
  def halfLife(df: DataFrame, groupCol: String, tsCol: String,
               valueCol: String, periodDays: Int, maxAge: Int = 20): DataFrame = {
    // 2^maxAge·Σ|value| must fit DECIMAL(38,2) — the documented bound
    require(maxAge >= 0 && maxAge <= 40,
      s"halfLife: maxAge must be in [0, 40], got $maxAge")
    // A NULL timestamp has no age: Spark's least() skips NULLs, which
    // would silently give such a row age = maxAge (floor weight) and
    // count it in n. Excluded by definition instead — the ksPerSource
    // NULL discipline.
    val rows = df.filter(to_date(col(tsCol)).isNotNull)
    val ref = rows.agg(max(to_date(col(tsCol))).as("__ref")) // one row
    val scaled = rows
      .crossJoin(broadcast(ref))
      .withColumn("__age",
        least(expr(s"datediff(__ref, to_date($tsCol)) div $periodDays"),
          lit(maxAge)))
      // 2^(maxAge - age) is exact in double for shifts <= 52, and the
      // decimal cast of an integral power of two is exact
      .withColumn("__w", pow(lit(2.0), lit(maxAge) - col("__age"))
        .cast("decimal(18,0)"))
      .withColumn("__scaled",
        (col(valueCol).cast("decimal(18,2)") * col("__w")).cast("decimal(38,2)"))
    scaled.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__scaled")).as("__tot"))
      .select(col(groupCol), col("n"),
        (col("__tot").cast("double") / pow(lit(2.0), lit(maxAge))).as("decayed"))
  }
}
