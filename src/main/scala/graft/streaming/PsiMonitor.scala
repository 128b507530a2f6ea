package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Drift
import graft.store.DocumentStore

/** Streaming PSI monitor — q267's scorecard-drift audit made continuous
  * on the [[LedgerMonitor]] ledger discipline: bin edges and reference
  * bin counts are FIXED at start from the reference sample (exact
  * quantiles — the monitor never learns from what it monitors); each
  * micro-batch's bin counts land in the per-batch LEDGER, and the
  * verdict carries the batch's own PSI (attribution) plus the cumulative
  * PSI over the ledger up to this batch (the standing dashboard number).
  * A feed whose score distribution walks away from the reference alerts
  * the trigger it happens, in the industry's own units (0.1/0.25 bands).
  *
  * Replay exactness and the all-NULL-batch guard are the base class's
  * (keyed upserts, batch_id-bounded cumulative read, empty census never
  * written); a batch with zero non-NULL values records (n_batch=0,
  * psi_batch=0, no alert) and leaves the cumulative number unchanged.
  *
  * Scale shape per trigger: one map-side-combined bin count over the
  * batch (the edge expression is a codegen CASE chain); ledger/verdict
  * state is bins-grid-sized, never corpus-sized. */
final class PsiMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String,
    edges: Seq[Long], refCells: Map[Int, Long],
    valueCol: String, alertAbove: Double) extends LedgerMonitor {

  require(alertAbove > 0, "bad alert threshold")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] = Seq("batch_id", "bin")

  /** ONE pass over the micro-batch: the grid-bounded bin counts land on
    * the driver (≤ bins+2 rows) and re-emit locally, so the verdict's n/
    * PSI reads never re-scan the batch — and the all-NULL case is a
    * plain empty frame, not an ANSI DIVIDE_BY_ZERO. */
  protected def census(batch: DataFrame, bid: Long): DataFrame = {
    val spark = batch.sparkSession
    val cells = batch.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .select(Drift.psiBin(edges).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    spark.createDataFrame(cells).toDF("bin", "o")
      .select(lit(bid).as("batch_id"), col("bin"), col("o"))
  }

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    val spark = census.sparkSession
    val cells = census.select(col("bin"), col("o"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val n = cells.map(_._2).sum
    val refDf = spark.createDataFrame(refCells.toSeq.sortBy(_._1))
      .toDF("bin", "n_ref")
    def verdictOf(cur: DataFrame) = Drift.psiFromCells(
      refDf.join(cur, Seq("bin"), "full")
        .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur")))
      .agg(max(col("psi"))).head().getDouble(0)
    val batchPsi =
      if (cells.isEmpty) 0.0
      else verdictOf(spark.createDataFrame(cells).toDF("bin", "n_cur"))
    // cumulative cells are ledger-grid-bounded; collected so an empty
    // cumulative window (replaying an empty first batch) is a plain
    // check, not a zero-total division
    val cumCells = ledger
      .groupBy(col("bin")).agg(sum(col("o")).as("n_cur"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val cumPsi =
      if (cumCells.isEmpty) 0.0
      else verdictOf(spark.createDataFrame(cumCells).toDF("bin", "n_cur"))
    spark.createDataFrame(Seq(
        (bid, n, batchPsi, cumPsi, batchPsi > alertAbove)))
      .toDF("batch_id", "n_batch", "psi_batch", "psi_cum", "alert")
  }
}

object PsiMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, reference: DataFrame, valueCol: String,
            checkpointDir: String, bins: Int = 10,
            alertAbove: Double = 0.25): StreamingQuery = {
    // edges + reference cells computed ONCE — the reference is
    // immutable by contract
    val (edges, rv) = Drift.psiEdges(reference, valueCol, bins)
    val refCells = rv.select(Drift.psiBin(edges).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_ref"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    new PsiMonitor(store, ledgerTable, resultTable, edges, refCells,
      valueCol, alertAbove).start(stream, checkpointDir)
  }

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, edges: Seq[Long],
                 refCells: Map[Int, Long], valueCol: String,
                 alertAbove: Double): Unit =
    new PsiMonitor(store, ledgerTable, resultTable, edges, refCells,
      valueCol, alertAbove).applyBatch(batch, bid)
}
