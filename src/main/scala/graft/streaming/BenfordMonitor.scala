package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Benford
import graft.store.DocumentStore

/** Streaming Benford fabrication monitor — the q248 audit made
  * continuous (the q192/q241 discipline): each micro-batch's
  * first-digit counts land in a per-batch LEDGER table, the verdict
  * recomputes the χ² distance per source both for THIS batch (the
  * attribution signal — which delivery was fabricated) and for the
  * CUMULATIVE ledger up to this batch (the standing-state signal a
  * dashboard reads), and a batch whose own digits depart the law past
  * `chiThreshold` alerts the trigger it arrives — not a quarterly
  * forensic audit later.
  *
  * Replay exactness (foreachBatch may re-run a batch after a crash):
  * the ledger rows are keyed upserts on (batch_id, src, d) and the
  * cumulative verdict reads the ledger AT batch_id ≤ this batch — a
  * replayed batch recomputes identical rows against identical state
  * even if later batches already landed; both upserts are no-ops.
  * Effective exactly-once, and the alert decision compares the
  * 6-dp-ROUNDED χ² (the persisted value) so the boundary replays.
  *
  * Scale shape per trigger: one map-side-combined digit count over the
  * batch; the ledger/verdict tables carry ≤ 9·sources rows per batch —
  * state is digit-grid-sized, never corpus-sized. */
object BenfordMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, sourceCol: String, valueCol: String,
            checkpointDir: String, chiThreshold: Double,
            minN: Long = 50L): StreamingQuery = {
    require(chiThreshold > 0 && minN >= 1, "bad monitor thresholds")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) applyBatch(batch, bid, store, ledgerTable,
          resultTable, sourceCol, valueCol, chiThreshold, minN)
        ()
      }
      .start()
  }

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, sourceCol: String,
                 valueCol: String, chiThreshold: Double, minN: Long): Unit = {
    val counts = Benford.digitCounts(batch, sourceCol, valueCol)
      .select(lit(bid).as("batch_id"), col("src"), col("d"), col("o"))
    if (store.exists(ledgerTable))
      store.upsert(ledgerTable, counts, Seq("batch_id", "src", "d"))
    else store.create(ledgerTable, counts)
    val batchChi = Benford.auditFromCounts(
        counts.select(col("src"), col("d"), col("o")))
      .groupBy(col("src"))
      .agg(max(col("n")).as("n_batch"), max(col("chi2")).as("chi2_batch"))
    val cumChi = Benford.auditFromCounts(
        store.read(ledgerTable).filter(col("batch_id") <= bid)
          .groupBy(col("src"), col("d")).agg(sum(col("o")).as("o")))
      .groupBy(col("src"))
      .agg(max(col("n")).as("n_cum"), max(col("chi2")).as("chi2_cum"))
    val verdict = batchChi.join(cumChi, "src")
      .select(lit(bid).as("batch_id"), col("src"),
        col("n_batch"), col("chi2_batch"), col("n_cum"), col("chi2_cum"),
        (col("n_batch") >= minN && col("chi2_batch") > chiThreshold)
          .as("alert"))
    if (store.exists(resultTable))
      store.upsert(resultTable, verdict, Seq("batch_id", "src"))
    else store.create(resultTable, verdict)
  }
}
