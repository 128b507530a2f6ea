package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.DocumentStore

/** Streaming CUSUM level-shift monitor — the q256 batch audit made
  * continuous on the [[LedgerMonitor]] ledger discipline: each
  * micro-batch lands its (n, 6-dp mean) in the per-batch LEDGER, and the
  * verdict recomputes the two-sided tabular CUSUM over the BATCH-MEAN
  * sequence up to this batch against an explicit target (the known-μ
  * industrial form — Montgomery, Statistical Quality Control §9.1):
  *
  *   S⁺_b = max(0, S⁺_{b−1} + (mean_b − target − k))
  *   S⁻_b = max(0, S⁻_{b−1} + (target − mean_b − k))
  *
  * alert when either side exceeds h. CUSUM accumulates what a per-batch
  * threshold cannot see: a sustained small drift crosses h after a few
  * batches even though every single batch looks fine.
  *
  * Replay exactness is the base's (keyed upserts on batch_id,
  * batch_id-bounded cumulative read); the verdict folds the PERSISTED
  * 6-dp means in batch order with exact DECIMAL(38,6) arithmetic
  * (max(0,·) via the cumsum-minus-running-min identity, the q256 form),
  * and the alert compares persisted values, so the boundary replays too.
  *
  * Scale shape per trigger: ONE map-side-combined aggregate over the
  * batch (two numbers); the verdict runs on the ≤batches ledger grid.
  * An all-NULL batch records (n=0, mean NULL, no alert) and contributes
  * nothing to the fold — never a wedged checkpoint (the q272 lesson,
  * now the base's contract). */
final class CusumMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String, valueCol: String,
    target: Double, k: Double, h: Double) extends LedgerMonitor {

  require(k >= 0 && h > 0, "bad CUSUM slack/threshold")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] = Seq("batch_id")

  /** One aggregate: exact decimal sum + count; the persisted mean is
    * the 6-dp close (the compare-the-rounded-value rule). The census is
    * ALWAYS one row — an all-NULL batch lands (n=0, mean NULL) so the
    * observation itself is on record. */
  protected def census(batch: DataFrame, bid: Long): DataFrame = {
    val spark = batch.sparkSession
    val r = batch.select(col(valueCol).cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("__v")).cast("decimal(38,6)").as("sv")).head()
    val n = r.getLong(0)
    // HALF_UP = DuckDB round() (away-from-zero) — the replay contract
    val mean: java.lang.Double =
      if (n == 0) null
      else Double.box(new java.math.BigDecimal(
        BigDecimal(r.getDecimal(1)).toDouble / n)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    spark.createDataFrame(Seq((bid, n, mean)))
      .toDF("batch_id", "n_batch", "mean_batch")
  }

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    val spark = census.sparkSession
    val n = census.head().getLong(1)
    if (n == 0)
      // a batch with no values carries no level evidence: record the
      // observation, leave the fold where it was, never alert
      return spark.createDataFrame(Seq((bid, 0L, null: java.lang.Double,
          0.0, 0.0, false)))
        .toDF("batch_id", "n_batch", "mean_batch", "cusum_pos",
          "cusum_neg", "alert")
    // exact decimal CUSUM over the persisted means <= bid
    val wc = Window.orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def side(dev: org.apache.spark.sql.Column) = {
      val c = sum(dev).over(wc).cast("decimal(38,6)")
      (c - least(min(c).over(wc), lit(0).cast("decimal(38,6)")))
        .cast("decimal(38,6)")
    }
    // every constant enters the fold as a pinned decimal — a double in
    // the expression would demote the whole CUSUM to float arithmetic
    def dec6(x: Double) = lit(new java.math.BigDecimal(x).setScale(6,
      java.math.RoundingMode.HALF_UP)).cast("decimal(38,6)")
    val hD = dec6(h)
    ledger.filter(col("n_batch") > 0)
      .withColumn("__m", col("mean_batch").cast("decimal(38,6)"))
      .withColumn("__sp", side(col("__m") - dec6(target) - dec6(k)))
      .withColumn("__sn", side(dec6(target) - col("__m") - dec6(k)))
      .filter(col("batch_id") === bid)
      .select(col("batch_id"), col("n_batch"), col("mean_batch"),
        col("__sp").cast("double").as("cusum_pos"),
        col("__sn").cast("double").as("cusum_neg"),
        (col("__sp") > hD || col("__sn") > hD).as("alert"))
  }
}

object CusumMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, valueCol: String, checkpointDir: String,
            target: Double, k: Double, h: Double): StreamingQuery =
    new CusumMonitor(store, ledgerTable, resultTable, valueCol, target,
      k, h).start(stream, checkpointDir)

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, valueCol: String,
                 target: Double, k: Double, h: Double): Unit =
    new CusumMonitor(store, ledgerTable, resultTable, valueCol, target,
      k, h).applyBatch(batch, bid)
}
