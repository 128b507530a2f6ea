package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across groups — map every group's empirical
  * distribution onto the POOLED distribution (the microarray
  * batch-correction classic, Bolstad et al. 2003, applied to corpus
  * curation: quality/length scores from heterogeneous sources are not
  * comparable raw — a "0.8" from a lenient scraper and a strict one
  * mean different things; after normalization a global threshold means
  * the same thing everywhere).
  *
  * The row at within-group rank r (of n_g) receives the pooled order
  * statistic at rank ⌊(r−1)·(N−1)/(n_g−1)⌋ + 1 (a singleton group maps
  * to the pooled median ⌊(N−1)/2⌋+1) — pure integer arithmetic, element
  * selection only (the q73 idiom), so the result replays bit-for-bit.
  * Overflow bound: (n_g−1)·(N−1) must fit in 64 bits — holds for any
  * realistic group×corpus (n_g·N < 9·10¹⁸); beyond that, pre-bucket
  * the value grid.
  *
  * Scale shape (the q86 global-sort trap avoided): the pooled ranking
  * is NEVER a global window. A vocab-bounded value-count grid gets
  * cumulative ranks in a grid-sized window; `explode(sequence)`
  * expands each value's rank INTERVAL into a distributed (rank, value)
  * table (N narrow rows, generated map-side); the per-row target rank
  * then resolves via a plain shuffle equi-join on rank. Per-group
  * ranks ride ONE `Exchange(group)` window. */
object QuantileNorm {

  /** (idCol, groupCol, valueCol, qnorm) — qnorm is the pooled order
    * statistic (same integer domain as valueCol). */
  def toPooled(df: DataFrame, groupCol: String, valueCol: String,
               idCol: String): DataFrame = {
    // NULL values have no place in an order statistic and engines
    // disagree on NULL sort order (the ksPerSource rationale) — a NULL
    // row would be window-ranked here AND emit a NULL grid interval,
    // so the output would silently contain NULL qnorm rows. Excluded.
    val rows = df.select(col(idCol), col(groupCol), col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    // vocab-bounded grid: pooled rank interval (lo, hi] per distinct value
    val grid = rows.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val wg = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankTable = grid
      .withColumn("__hi", sum(col("__c")).over(wg))
      .select(col("__v").as("__pv"),
        explode(sequence(col("__hi") - col("__c") + 1, col("__hi"))).as("__rank"))
    val n = rows.agg(count(lit(1)).as("__n")) // one row
    val ws = Window.partitionBy(col(groupCol)).orderBy(col("__v"), col(idCol))
    val wsz = Window.partitionBy(col(groupCol))
    val ranked = rows
      .withColumn("__r", row_number().over(ws).cast("long"))
      .withColumn("__ng", count(lit(1)).over(wsz))
      .crossJoin(broadcast(n))
      .withColumn("__rank", // integer div (not double floor): exact past 2^53
        when(col("__ng") === 1, expr("(__n - 1) div 2") + 1)
          .otherwise(expr("((__r - 1) * (__n - 1)) div (__ng - 1)") + 1))
    ranked.join(rankTable, "__rank")
      .select(col(idCol), col(groupCol), col("__v").as(valueCol),
        col("__pv").as("qnorm"))
  }
}
