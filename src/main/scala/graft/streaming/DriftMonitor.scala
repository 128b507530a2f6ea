package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Drift
import graft.store.DocumentStore

/** Streaming distribution-drift monitor — the data-quality tripwire in
  * front of a continuously-ingesting corpus: every micro-batch's
  * feature distribution (doc length, token count, any pre-quantized
  * numeric) is KS-tested against a FIXED reference sample, and the
  * per-batch verdict lands in a store table the pipeline can alert
  * on. A feed that silently started truncating documents flips its
  * batch's `alert` the moment it happens — batches later, not a
  * corpus-audit later (the q200 batch form made continuous, exactly
  * as q192 made q181's dedup gate continuous).
  *
  * The alert decision is INTEGER arithmetic end to end: KS ≥ thr with
  * thr = thrNum/thrDen iff ks_num·thrDen ≥ thrNum·n_batch·n_ref — no
  * float comparison sits on the alert boundary, so the decision
  * replays bit-for-bit in SQL and across partitionings.
  *
  * Replay exactness (foreachBatch may re-run a batch after a crash):
  * the verdict row is a keyed upsert on batch_id and the reference
  * frame is immutable, so a replayed batch recomputes the identical
  * row and the upsert is a no-op — effective exactly-once.
  *
  * Scale shape per batch: the KS grid is |batch values ∪ reference
  * values| rows (the reference is a bounded SAMPLE by contract — keep
  * it thousands, not the corpus); batch cost tracks the batch. */
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
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) applyBatch(batch, bid, store, resultTable,
          reference, valueCol, thrNum, thrDen)
        ()
      }
      .start()
  }

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 resultTable: String, reference: DataFrame, valueCol: String,
                 thrNum: Long, thrDen: Long): Unit = {
    val row = Drift.ksTwoSample(batch, reference, valueCol)
      .select(lit(bid).as("batch_id"),
        col("n_a").as("n_batch"), col("n_b").as("n_ref"),
        col("ks_num"), col("ks"),
        (col("ks_num") * thrDen >= col("n_a") * col("n_b") * thrNum).as("alert"))
    if (store.exists(resultTable)) store.upsert(resultTable, row, Seq("batch_id"))
    else store.create(resultTable, row)
  }
}
