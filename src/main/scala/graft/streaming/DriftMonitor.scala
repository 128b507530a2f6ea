package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Drift
import graft.store.DocumentStore

/** Streaming distribution-drift monitor — the data-quality tripwire in
  * front of a continuously-ingesting corpus, on the [[LedgerMonitor]]
  * discipline (ledger-less: the verdict compares each batch against a
  * FIXED reference, no cumulative state): every micro-batch's feature
  * distribution (doc length, token count, any pre-quantized numeric) is
  * KS-tested against the reference sample, and the per-batch verdict
  * lands in a store table the pipeline can alert on. A feed that
  * silently started truncating documents flips its batch's `alert` the
  * moment it happens — batches later, not a corpus-audit later.
  *
  * The alert decision is INTEGER arithmetic end to end: KS ≥ thr with
  * thr = thrNum/thrDen iff ks_num·thrDen ≥ thrNum·n_batch·n_ref — no
  * float comparison sits on the alert boundary, so the decision replays
  * bit-for-bit in SQL and across partitionings.
  *
  * Replay exactness is the base's (keyed upsert on batch_id against an
  * immutable reference). An all-NULL batch has no EDF: it records no
  * verdict row — and never a spurious alert (the empty-census contract,
  * MonitorContractSpec).
  *
  * Scale shape per batch: the KS grid is |batch values ∪ reference
  * values| rows (the reference is a bounded SAMPLE by contract — keep
  * it thousands, not the corpus); batch cost tracks the batch. */
final class DriftMonitor(
    protected val store: DocumentStore, result: String,
    reference: DataFrame, valueCol: String,
    thrNum: Long, thrDen: Long) extends LedgerMonitor {

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id")

  /** Ledger-less: the census is the batch itself (the frame the KS
    * verdict consumes); ksTwoSample NULL-filters internally. */
  protected def census(batch: DataFrame, bid: Long): DataFrame = batch

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame =
    // an all-NULL batch contributes no source-'a' EDF row: the verdict
    // is empty — no row recorded, never a spurious 0>=0 alert
    Drift.ksTwoSample(census, reference, valueCol)
      .select(lit(bid).as("batch_id"),
        col("n_a").as("n_batch"), col("n_b").as("n_ref"),
        col("ks_num"), col("ks"),
        (col("ks_num") * thrDen >= col("n_a") * col("n_b") * thrNum)
          .as("alert"))
}

object DriftMonitor {

  def start(stream: DataFrame, store: DocumentStore, resultTable: String,
            reference: DataFrame, valueCol: String, checkpointDir: String,
            thrNum: Long, thrDen: Long): StreamingQuery = {
    // ksTwoSample's contract: both sides non-empty (an empty side has
    // no EDF). An empty reference would make every batch spuriously
    // alert (ks NULL, integer decision 0 >= 0) — check ONCE here, not
    // per batch; the reference is immutable by contract.
    require(!reference.isEmpty,
      "DriftMonitor: reference sample must be non-empty")
    new DriftMonitor(store, resultTable, reference, valueCol, thrNum,
      thrDen).start(stream, checkpointDir)
  }

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 resultTable: String, reference: DataFrame, valueCol: String,
                 thrNum: Long, thrDen: Long): Unit =
    new DriftMonitor(store, resultTable, reference, valueCol, thrNum,
      thrDen).applyBatch(batch, bid)
}
