package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.SchemaAudit
import graft.store.DocumentStore

/** Streaming schema-drift monitor — the q315 batch audit made
  * continuous on the [[LedgerMonitor]] ledger discipline (and the
  * seventh monitor on the base, which is the point: census + verdict
  * are the ONLY code here — the empty-batch guard, replay idempotence,
  * and the keyed-upsert write path are structural). Each micro-batch
  * is an ingest epoch: its per-field raw-JSON type census lands in the
  * ledger, and the verdict recomputes dominance over the ledger at
  * `batch_id <= bid` via [[SchemaAudit.auditFromCells]] — so a
  * dominant-type flip against the PREVIOUS batch alerts while both
  * batches' counts stay on record for the quarantine decision.
  *
  * An all-NULL batch (rows, but no parseable docs) produces an empty
  * census: the base skips the ledger write, dominance at `<= bid` has
  * no rows for this bid, the verdict emits nothing — no wedge, no
  * phantom flip (the base's contract, spec'd in MonitorContractSpec).
  *
  * Scale shape per trigger: ONE pass over the batch (the per-field
  * classifiers are one codegen'd projection) onto the fields×8 grid;
  * the verdict runs on the ≤batches×fields×8 ledger grid. */
final class SchemaMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String, docCol: String,
    fields: Seq[String]) extends LedgerMonitor {

  require(fields.nonEmpty, "need at least one audited field")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id", "field")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] =
    Seq("batch_id", "field", "t")

  protected def census(batch: DataFrame, bid: Long): DataFrame =
    SchemaAudit.cells(batch.withColumn("__bid", lit(bid)),
        "__bid", docCol, fields)
      .select(col("epoch").as("batch_id"), col("field"), col("t"),
        col("n"))

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame =
    SchemaAudit.auditFromCells(
        ledger.select(col("batch_id").as("epoch"), col("field"),
          col("t"), col("n")))
      .filter(col("epoch") === bid)
      .select(col("epoch").as("batch_id"), col("field"), col("n_docs"),
        col("dom_type"), col("n_dom"), col("prev_type"), col("flipped"))
}

object SchemaMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, docCol: String, fields: Seq[String],
            checkpointDir: String): StreamingQuery =
    new SchemaMonitor(store, ledgerTable, resultTable, docCol, fields)
      .start(stream, checkpointDir)

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, docCol: String,
                 fields: Seq[String]): Unit =
    new SchemaMonitor(store, ledgerTable, resultTable, docCol, fields)
      .applyBatch(batch, bid)
}
