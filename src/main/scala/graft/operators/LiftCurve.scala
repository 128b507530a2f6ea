package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cumulative gains / lift table by score decile — the targeting-value
  * reading of a ranking score, closing the score-evaluation family:
  * q201's AUC says whether the score ORDERS, q224/q245 whether its
  * VALUES are honest probabilities; the gains table answers the
  * operational question — "if I act on the top k%, what share of the
  * positives do I capture, and at how many times random?" (lift). A
  * curation pipeline reads it to budget review queues; an ads/fraud
  * team to set intervention depth.
  *
  * Construction: rank by (score desc, id) — the id tie-break makes the
  * decile assignment total and deterministic; decile =
  * ⌊(rank−1)·10/n⌋ exact integer arithmetic; per-decile exact (n, pos)
  * cells; cumulative gain/lift from grid-window sums over the ≤10-row
  * table, each a single closing division.
  *
  * Scale shape: the global rank window is the honest cost (one
  * corpus-sized sort-shuffle — the same shape as q92's shuffle-order
  * gate; for an approximate-decile variant at extreme scale, bucket on
  * [[ExactQuantile]] score edges instead, trading the sort for two
  * scans); everything after runs on the decile grid. */
object LiftCurve {

  /** Per decile (0 = highest scores): (decile, n, pos, gain, lift) —
    * `gain` = cumulative share of all positives captured through this
    * decile, `lift` = cumulative positive rate ÷ base rate. */
  def gainsTable(df: DataFrame, idCol: String, scoreCol: String,
                 labelCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 100, s"bad buckets=$buckets")
    val u = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(scoreCol).as("__s"),
        col(labelCol).cast("boolean").as("__y"))
    val tot = u.agg(count(lit(1)).as("__n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("__pos")).head()
    val n = tot.getLong(0); val pos = tot.getLong(1)
    require(n >= buckets, s"$n rows cannot fill $buckets buckets")
    require(pos > 0, "gainsTable: no positives — gain/lift undefined")
    val w = Window.orderBy(col("__s").desc, col("__id"))
    // explicit floor: a bare cast-after-division would inherit the
    // engine's double→int convention (Spark truncates, DuckDB rounds).
    // rank cast to long BEFORE the multiply: row_number is IntegerType
    // and int·buckets overflows (ANSI: crashes) past n·buckets > 2^31
    // (~214M rows at 10 buckets — well inside corpus scale)
    val cells = u.withColumn("__rn", row_number().over(w))
      .groupBy(floor((col("__rn").cast("long") - 1) * buckets / n).cast("int")
        .as("decile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
    val wc = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__cn", sum(col("n")).over(wc))
      .withColumn("__cp", sum(col("pos")).over(wc))
      .select(col("decile"), col("n"), col("pos"),
        round(col("__cp").cast("double") / pos, 6).as("gain"),
        round((col("__cp").cast("double") / col("__cn")) /
          (pos.toDouble / n), 6).as("lift"))
      .orderBy(col("decile"))
  }
}
