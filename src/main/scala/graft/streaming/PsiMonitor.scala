package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Drift
import graft.store.DocumentStore

/** Streaming PSI monitor — q267's scorecard-drift audit made
  * continuous (the BenfordMonitor ledger pattern, which is itself the
  * q192/q241 discipline): bin edges and reference bin counts are FIXED
  * at start from the reference sample (exact quantiles — the monitor
  * never learns from what it monitors); each micro-batch's bin counts
  * land in a per-batch LEDGER, and the verdict carries the batch's own
  * PSI (attribution) plus the cumulative PSI over the ledger up to
  * this batch (the standing dashboard number). A feed whose score
  * distribution walks away from the reference alerts the trigger it
  * happens, in the industry's own units (0.1 / 0.25 bands).
  *
  * Replay exactness: ledger rows are keyed upserts on (batch_id, bin);
  * the cumulative verdict reads the ledger AT batch_id ≤ this batch —
  * a replayed batch recomputes identical rows even after later batches
  * landed; both upserts are no-ops. The alert compares the persisted
  * 6-dp PSI.
  *
  * Scale shape per trigger: one map-side-combined bin count over the
  * batch (the edge expression is a codegen CASE chain); ledger/verdict
  * state is bins-grid-sized, never corpus-sized. */
object PsiMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, reference: DataFrame, valueCol: String,
            checkpointDir: String, bins: Int = 10,
            alertAbove: Double = 0.25): StreamingQuery = {
    require(alertAbove > 0, "bad alert threshold")
    // edges + reference cells computed ONCE — the reference is
    // immutable by contract
    val (edges, rv) = Drift.psiEdges(reference, valueCol, bins)
    val refCells = rv.select(Drift.psiBin(edges).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_ref"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) applyBatch(batch, bid, store, ledgerTable,
          resultTable, edges, refCells, valueCol, alertAbove)
        ()
      }
      .start()
  }

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, edges: Seq[Long],
                 refCells: Map[Int, Long], valueCol: String,
                 alertAbove: Double): Unit = {
    val spark = batch.sparkSession
    // ONE pass over the micro-batch: the grid-bounded bin counts land on
    // the driver (≤ bins+2 rows) and feed the ledger upsert, the batch
    // PSI, and n without re-scanning the batch (the old shape scanned it
    // three times) — and make the all-NULL-batch case a plain isEmpty
    // check instead of an ANSI DIVIDE_BY_ZERO that would wedge the
    // checkpoint replaying the same batch forever
    val cells = batch.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .select(Drift.psiBin(edges).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val n = cells.map(_._2).sum
    if (cells.nonEmpty) {
      val counts = spark.createDataFrame(cells).toDF("bin", "o")
        .select(lit(bid).as("batch_id"), col("bin"), col("o"))
      if (store.exists(ledgerTable))
        store.upsert(ledgerTable, counts, Seq("batch_id", "bin"))
      else store.create(ledgerTable, counts)
    }
    val refDf = spark.createDataFrame(refCells.toSeq.sortBy(_._1))
      .toDF("bin", "n_ref")
    def verdictOf(cur: DataFrame) = Drift.psiFromCells(
      refDf.join(cur, Seq("bin"), "full")
        .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur")))
      .agg(max(col("psi"))).head().getDouble(0)
    // a batch with zero non-NULL values carries no distribution — PSI
    // against it is undefined; record the observation (n_batch=0,
    // psi_batch=0, no alert) instead of crashing, and leave the ledger
    // untouched so the cumulative number is unchanged
    val batchPsi =
      if (cells.isEmpty) 0.0
      else verdictOf(spark.createDataFrame(cells).toDF("bin", "n_cur"))
    // cumulative cells are ledger-grid-bounded; collected so an empty
    // cumulative window (replaying an empty first batch) is a plain
    // check, not a zero-total division
    val cumCells =
      if (store.exists(ledgerTable))
        store.read(ledgerTable).filter(col("batch_id") <= bid)
          .groupBy(col("bin")).agg(sum(col("o")).as("n_cur"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
      else Seq.empty
    val cumPsi =
      if (cumCells.isEmpty) 0.0
      else verdictOf(spark.createDataFrame(cumCells).toDF("bin", "n_cur"))
    val verdict = spark.createDataFrame(Seq(
        (bid, n, batchPsi, cumPsi, batchPsi > alertAbove)))
      .toDF("batch_id", "n_batch", "psi_batch", "psi_cum", "alert")
    if (store.exists(resultTable))
      store.upsert(resultTable, verdict, Seq("batch_id"))
    else store.create(resultTable, verdict)
  }
}
