package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Benford
import graft.store.DocumentStore

/** Streaming Benford fabrication monitor — the q248 audit made
  * continuous on the [[LedgerMonitor]] ledger discipline: each
  * micro-batch's first-digit counts land in the per-batch LEDGER, the
  * verdict recomputes the χ² distance per source both for THIS batch
  * (the attribution signal — which delivery was fabricated) and for the
  * CUMULATIVE ledger up to this batch (the standing-state signal a
  * dashboard reads), and a batch whose own digits depart the law past
  * `chiThreshold` alerts the trigger it arrives — not a quarterly
  * forensic audit later.
  *
  * Replay exactness is the base's (keyed upserts on (batch_id, src, d),
  * batch_id-bounded cumulative read); the alert decision compares the
  * 6-dp-ROUNDED χ² (the persisted value) so the boundary replays. An
  * all-NULL batch yields an empty digit census: nothing lands in the
  * ledger and no verdict row is recorded.
  *
  * Scale shape per trigger: one map-side-combined digit count over the
  * batch; the ledger/verdict tables carry ≤ 9·sources rows per batch —
  * state is digit-grid-sized, never corpus-sized. */
final class BenfordMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String,
    sourceCol: String, valueCol: String,
    chiThreshold: Double, minN: Long) extends LedgerMonitor {

  require(chiThreshold > 0 && minN >= 1, "bad monitor thresholds")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id", "src")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] = Seq("batch_id", "src", "d")

  protected def census(batch: DataFrame, bid: Long): DataFrame =
    Benford.digitCounts(batch, sourceCol, valueCol)
      .select(lit(bid).as("batch_id"), col("src"), col("d"), col("o"))

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    val batchChi = Benford.auditFromCounts(
        census.select(col("src"), col("d"), col("o")))
      .groupBy(col("src"))
      .agg(max(col("n")).as("n_batch"), max(col("chi2")).as("chi2_batch"))
    val cumChi = Benford.auditFromCounts(
        ledger.groupBy(col("src"), col("d")).agg(sum(col("o")).as("o")))
      .groupBy(col("src"))
      .agg(max(col("n")).as("n_cum"), max(col("chi2")).as("chi2_cum"))
    batchChi.join(cumChi, "src")
      .select(lit(bid).as("batch_id"), col("src"),
        col("n_batch"), col("chi2_batch"), col("n_cum"), col("chi2_cum"),
        (col("n_batch") >= minN && col("chi2_batch") > chiThreshold)
          .as("alert"))
  }
}

object BenfordMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, sourceCol: String, valueCol: String,
            checkpointDir: String, chiThreshold: Double,
            minN: Long = 50L): StreamingQuery =
    new BenfordMonitor(store, ledgerTable, resultTable, sourceCol,
      valueCol, chiThreshold, minN).start(stream, checkpointDir)

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, sourceCol: String,
                 valueCol: String, chiThreshold: Double, minN: Long): Unit =
    new BenfordMonitor(store, ledgerTable, resultTable, sourceCol,
      valueCol, chiThreshold, minN).applyBatch(batch, bid)
}
