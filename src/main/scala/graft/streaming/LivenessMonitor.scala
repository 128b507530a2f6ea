package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.DocumentStore

/** Streaming source-liveness monitor — the plainest production alert
  * and the one failure class the value-distribution monitors
  * (Drift/Psi/Cusum) are BLIND to: a source that silently stops
  * sending. Every micro-batch lands its per-source row count in the
  * ledger; the verdict flags every KNOWN source (seen anywhere in the
  * ledger prefix) whose trailing `quietBatches` batches — including
  * this one — carried zero rows. A brand-new source cannot alert
  * (nothing is "late" until it has been seen), and a recovered source
  * clears on the batch it reappears.
  *
  * Eighth monitor on the [[LedgerMonitor]] base: census + verdict
  * only. The empty-batch contract is natural here — an all-NULL batch
  * produces an empty census, the ledger gains no rows for this bid,
  * and the verdict is computed against the unchanged prefix (sources
  * do NOT accrue silence from a batch that never carried usable rows,
  * the replay-idempotence reading of "no observation").
  *
  * Scale shape per trigger: ONE map-side-combined (source) count over
  * the batch; the verdict runs on the ≤batches×sources ledger grid.
  * All counting exact integers. */
final class LivenessMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String, sourceCol: String,
    quietBatches: Int) extends LedgerMonitor {

  require(quietBatches >= 1, s"bad quietBatches=$quietBatches")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id", "source")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] =
    Seq("batch_id", "source")

  protected def census(batch: DataFrame, bid: Long): DataFrame =
    batch.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(count(lit(1)).as("n"))
      .select(lit(bid).as("batch_id"), col("source"), col("n"))

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    // every (known source × ledger batch) cell, 0-filled, then the
    // trailing-quiet run length per source at THIS batch
    val batches = ledger.select(col("batch_id")).distinct()
    val sources = ledger.select(col("source")).distinct()
    val w = Window.partitionBy(col("source")).orderBy(col("batch_id"))
    val filled = sources.crossJoin(batches)
      .join(ledger, Seq("batch_id", "source"), "left")
      .withColumn("__n", coalesce(col("n"), lit(0L)))
      .withColumn("__rn", row_number().over(w).cast("long"))
      // position of the source's most recent non-empty OBSERVED batch
      // (quiet runs count ledger batches, not batch-id gaps — an
      // all-NULL trigger never entered the ledger and accrues nothing)
      .withColumn("__seenRn",
        max(when(col("__n") > 0, col("__rn"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__quiet", col("__rn") - col("__seenRn"))
    filled.filter(col("batch_id") === bid && col("__seenRn").isNotNull)
      .select(col("batch_id"), col("source"), col("__n").as("n"),
        col("__quiet").as("quiet_batches"),
        (col("__quiet") >= quietBatches).as("alert"))
  }
}

object LivenessMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, sourceCol: String, quietBatches: Int,
            checkpointDir: String): StreamingQuery =
    new LivenessMonitor(store, ledgerTable, resultTable, sourceCol,
      quietBatches).start(stream, checkpointDir)

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String,
                 sourceCol: String, quietBatches: Int): Unit =
    new LivenessMonitor(store, ledgerTable, resultTable, sourceCol,
      quietBatches).applyBatch(batch, bid)
}
