package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: compress a
  * change-event stream into validity intervals per key.
  *
  * The reference keeps only the LATEST state of its entities (upsert by
  * id — MongoDbService.cs:563-592 replaces the session document in
  * place); an analytics engine feeding training pipelines needs the
  * history too, because features must be joined AS OF the example's
  * timestamp (see [[AsOfJoin]]) and that requires validity intervals,
  * not last-write-wins. This operator turns (key, ts, state) events
  * into the classic SCD2 shape: one row per (key, state-run) with
  * `valid_from`/`valid_to`, a per-key `version`, and `is_current`.
  *
  * Scale shape: ONE shuffle on the key shared by every step — the
  * run-detection lag, the run-numbering running sum, the per-run
  * groupBy, and the valid_to lead all declare the same
  * partitionBy(key)/orderBy(ts) so Catalyst plans a single Exchange;
  * state per task is bounded by the window frame (a handful of rows),
  * never the key's full history.
  *
  * Consecutive duplicate states collapse into one interval (an event
  * restating the current value extends nothing and creates no row) —
  * idempotent re-delivery of the same state is absorbed, matching CDC
  * at-least-once sources.
  */
object Scd2 {

  /** @param keyCol    dimension key
    * @param tsCol     change timestamp (interval start candidates)
    * @param stateCols the tracked attribute columns
    * @param tieCol    deterministic tie-break for equal timestamps
    * @return (keyCol, stateCols*, valid_from, valid_to, version,
    *         is_current); valid_to is NULL on the open interval. */
  def fromChanges(events: DataFrame, keyCol: String, tsCol: String,
                  stateCols: Seq[String], tieCol: String): DataFrame = {
    require(stateCols.nonEmpty, "no state columns")
    val ord = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val state: Column = struct(stateCols.map(col): _*)
    val runs = events
      .withColumn("__prev", lag(state, 1).over(w))
      // null-safe: first row of a key always opens a run
      .withColumn("__new", when(col("__prev").isNull || !(col("__prev") <=> state), 1)
        .otherwise(0))
      .withColumn("__run", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("__run"))
      .agg(min(col(tsCol)).as("valid_from"),
        stateCols.map(c => first(col(c)).as(c)): _*)
    // valid_to ordering includes __run (the deterministic event-order run
    // number): two runs of one key can START at the same timestamp
    // (distinct states at equal ts, tie-broken by tieCol upstream), and
    // ordering by valid_from alone would make the lead — hence version
    // chaining — nondeterministic for them
    val wr = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"), col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .withColumn("version", col("__run"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}
