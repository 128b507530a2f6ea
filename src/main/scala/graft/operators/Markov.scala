package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition audit over per-entity event sequences
  * — the behavioural fingerprint q268's sequence support reads one
  * pair at a time, materialised as the full row-normalised transition
  * matrix: P(next | prev) for every observed state pair. Curators diff
  * this matrix across corpus versions (a bot cohort shows up as a
  * near-deterministic row; a tracking regression shows up as mass
  * moving into a sink state); it is also the sufficient statistic for
  * sequence perplexity under a first-order model.
  *
  * Semantics: transitions are ADJACENT pairs within an entity's
  * event sequence ordered by (tsCol, tieCol) — the deterministic
  * total order the house uses everywhere (q268's lead ordering).
  *
  * Exactness: pair counts and row totals are BIGINTs off one
  * aggregate; p = n/row_total is a single closing division, 6-dp.
  *
  * Scale shape: ONE Exchange(entity) feeds the lag window (per-entity
  * sort, n log n per partition), then a map-side-combined count onto
  * the ≤states² grid; the row totals join is grid-sized. Event lists
  * never materialise. */
object Markov {

  /** (prev_state, next_state, n, row_total, p) over the states² grid,
    * ordered by (prev_state, next_state). */
  def transitions(events: DataFrame, entityCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .filter(col(tsCol).isNotNull && col(stateCol).isNotNull)
      .select(col(entityCol), col(stateCol).as("prev_state"),
        col(tsCol), col(tieCol))
      .withColumn("next_state", lead(col("prev_state"), 1).over(w))
      .filter(col("next_state").isNotNull)
    val counts = pairs.groupBy(col("prev_state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
    val rowTot = counts.groupBy(col("prev_state"))
      .agg(sum(col("n")).as("row_total"))
    counts.join(broadcast(rowTot), "prev_state")
      .select(col("prev_state"), col("next_state"), col("n"),
        col("row_total"),
        round(col("n").cast("double") / col("row_total").cast("double"), 6)
          .as("p"))
      .orderBy(col("prev_state"), col("next_state"))
  }
}
