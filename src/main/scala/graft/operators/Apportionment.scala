package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment — turn fractional group
  * weights into integer allocations that sum EXACTLY to the budget
  * (Hamilton 1792; the apportionment literature's baseline method).
  * The missing last step of every sampling-allocation derivation the
  * engine ships: Neyman (q216) and temperature (q212) emit per-group
  * TARGETS that round to something near the budget — a sampler that
  * draws "about n" rows leaks budget nondeterministically. Hamilton
  * closes it: base = ⌊w·budget/W⌋ per group, then the leftover seats
  * go to the largest remainders (ties → smaller group key, total
  * order), so Σ alloc = budget by construction, bit-for-bit on any
  * engine.
  *
  * All arithmetic is exact BIGINT (w·budget must fit 2⁶³ — weights up
  * to 10¹² with budgets to 10⁶, ample for allocation tables; the
  * product guard fails loudly). Known Hamilton quirks (Alabama
  * paradox) are properties of the METHOD, documented here: within one
  * allocation the result is exact and stable.
  *
  * Scale shape: allocation tables are group-cardinality — one
  * aggregate for W, one grid-sized window for the remainder ranks.
  * The corpus never appears; feed the output to the per-group exact
  * sampler ([[Splits.bottomKSample]]) as its k. */
object Apportionment {

  /** (group, weight, base, extra, alloc) with Σ alloc = budget. */
  def hamilton(df: DataFrame, groupCol: String, weightCol: String,
               budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val w = df.select(col(groupCol).as("__g"), col(weightCol).cast("long").as("__w"))
    val shape = w.agg(coalesce(sum(col("__w")), lit(0L)).as("tw"),
      coalesce(min(col("__w")), lit(0L)).as("mn"),
      coalesce(max(col("__w")), lit(0L)).as("mx"),
      count(lit(1)).as("n"), countDistinct(col("__g")).as("d"),
      count(col("__w")).as("nw")).head()
    require(shape.getLong(3) > 0, "hamilton: need at least one group")
    require(shape.getLong(3) == shape.getLong(4), "hamilton: duplicate group keys")
    // min/sum/require skip NULLs — a NULL-weight group would pass the
    // guards, get NULL base/alloc, and break Σ alloc = budget silently
    require(shape.getLong(5) == shape.getLong(3),
      "hamilton: weights must not be NULL")
    require(shape.getLong(1) >= 0, "hamilton: weights must be non-negative")
    val total = shape.getLong(0)
    require(total > 0, "hamilton: total weight must be positive")
    require(shape.getLong(2) <= Long.MaxValue / math.max(budget, 1L),
      s"hamilton: weight x budget would overflow 64 bits")
    val based = w
      .withColumn("base", expr(s"(__w * $budget) div $total"))
      .withColumn("__rem", expr(s"(__w * $budget) % $total"))
    val leftover = budget - based.agg(sum(col("base"))).head().getLong(0)
    val wr = Window.orderBy(col("__rem").desc, col("__g"))
    based
      .withColumn("extra",
        when(row_number().over(wr) <= leftover, 1L).otherwise(0L))
      .select(col("__g").as(groupCol), col("__w").as(weightCol),
        col("base"), col("extra"), (col("base") + col("extra")).as("alloc"))
  }
}
