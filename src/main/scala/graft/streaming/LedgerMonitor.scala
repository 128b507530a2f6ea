package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.DocumentStore

/** The sufficient-statistic ledger base every streaming monitor runs on —
  * the one implementation of the foreachBatch discipline that six
  * near-identical shells (Drift, Seasonal, Benford, Psi, Cusum, Anytime)
  * had each re-rolled by hand, re-rolling its bugs with it (the PsiMonitor
  * all-NULL-batch wedge had to be manually re-guarded "at birth" in
  * CusumMonitor — VERDICT r15 finding 2).
  *
  * The discipline, now structural:
  *
  *  1. '''Census, then verdict.''' Each micro-batch reduces to a
  *     grid-bounded sufficient-statistic frame ([[census]]); the verdict
  *     is computed from that census plus the PERSISTED cumulative ledger
  *     at `batch_id <= bid` — never from corpus-sized state.
  *  2. '''Replay idempotence.''' ALL writes are keyed upserts
  *     (create-on-first-use) and the cumulative read is bounded by the
  *     replayed batch's own id, so foreachBatch re-running a batch after
  *     a crash recomputes identical rows against identical state even if
  *     later batches already landed — effective exactly-once. A monitor
  *     CANNOT append, and cannot read past its own batch.
  *  3. '''The all-NULL-batch guard.''' Fully-empty batches are skipped in
  *     the base's foreachBatch shell; an all-NULL batch (rows, but no
  *     usable values) produces an EMPTY census, which the base declines
  *     to write to the ledger — and then STILL calls [[verdict]], whose
  *     contract is to be total over an empty census (record a no-signal
  *     row, or no row — never throw). A monitor that divides by a batch
  *     count before checking it fails MonitorContractSpec on day one
  *     instead of wedging a production checkpoint replaying the same
  *     batch forever.
  *
  * Scale shape (shared by construction): per trigger, one bounded census
  * over the batch; ledger/verdict state is grid-sized, never
  * corpus-sized. */
abstract class LedgerMonitor {

  protected def store: DocumentStore
  protected def resultTable: String
  protected def resultKeys: Seq[String]
  /** Monitors whose verdict needs cumulative per-batch state declare a
    * ledger; stateless monitors (verdict = census vs fixed reference)
    * leave it None. */
  protected def ledgerTable: Option[String] = None
  protected def ledgerKeys: Seq[String] = Nil

  /** The micro-batch's grid-bounded sufficient-statistic rows, already
    * NULL-filtered and stamped with `batch_id`. MUST be total: an
    * all-NULL batch returns an empty frame (with the ledger schema),
    * never throws. Ledger-less monitors may return the batch itself —
    * the frame the verdict consumes. */
  protected def census(batch: DataFrame, bid: Long): DataFrame

  /** Verdict rows for batch `bid`, computed from this batch's census and
    * the cumulative ledger at `batch_id <= bid` (an empty, census-shaped
    * frame when no ledger exists yet, or for ledger-less monitors).
    * MUST be total over an empty census — the all-NULL-batch contract. */
  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame

  /** One monitoring round — foreachBatch body, also the batch-replay /
    * oracle entry point. */
  final def applyBatch(batch: DataFrame, bid: Long): Unit = {
    val c = census(batch, bid)
    ledgerTable.foreach { lt =>
      // an empty census carries no statistic: writing it would only
      // materialize an empty table version; the cumulative number must
      // be unchanged (the PsiMonitor wedge contract)
      if (!c.isEmpty) write(lt, c, ledgerKeys)
    }
    val led = ledgerTable match {
      case Some(lt) if store.exists(lt) =>
        store.read(lt).filter(col("batch_id") <= bid)
      case _ => c.limit(0)
    }
    write(resultTable, verdict(bid, c, led), resultKeys)
  }

  final def start(stream: DataFrame, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) applyBatch(batch, bid)
        ()
      }
      .start()

  /** Keyed upsert-or-create — the ONLY write path, so every monitor row
    * is replay-idempotent by construction. */
  private def write(table: String, rows: DataFrame, keys: Seq[String]): Unit =
    if (store.exists(table)) store.upsert(table, rows, keys)
    else store.create(table, rows)
}
