package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.DocumentStore

/** Streaming anytime-valid A/B monitor — the q312 mSPRT trajectory made
  * continuous on the [[LedgerMonitor]] ledger discipline: each
  * micro-batch lands its per-arm (n, successes) census in the keyed
  * LEDGER, the verdict recomputes the mixture likelihood ratio over the
  * CUMULATIVE counts at batch_id ≤ this batch, and the always-valid p is
  * the running minimum of the 6-dp-pinned per-look values — so the
  * experiment dashboard this sink feeds is safe to watch at every
  * trigger (Johari, Koomen, Pekelis & Walsh, KDD 2017), unlike a
  * per-batch z-test whose optional stopping inflates false alarms.
  *
  * Replay exactness is the base's (keyed upserts on batch_id,
  * batch_id-bounded cumulative read); significance compares the
  * PERSISTED rounded p, so the boundary replays. An all-NULL or
  * one-armed batch still lands its (possibly zero) census and simply
  * carries the previous p forward — never a wedged checkpoint.
  *
  * Scale shape per trigger: ONE map-side-combined census over the batch
  * (four numbers); the verdict runs on the ≤batches ledger grid. */
final class AnytimeMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String,
    armCol: String, successCol: String,
    tau: Double, alpha: Double) extends LedgerMonitor {

  require(tau > 0 && alpha > 0 && alpha < 1, "bad monitor params")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] = Seq("batch_id")

  /** The census is ALWAYS one row — an all-NULL batch lands its zero
    * counts so the observation itself is on record. */
  protected def census(batch: DataFrame, bid: Long): DataFrame = {
    val a = col(armCol).cast("int"); val y = col(successCol).cast("boolean")
    val r = batch.filter(a.isNotNull && y.isNotNull)
      .agg(sum(when(a === 0, 1L).otherwise(0L)).as("d0"),
        sum(when(a =!= 0, 1L).otherwise(0L)).as("d1"),
        sum(when(a === 0 && y, 1L).otherwise(0L)).as("s0"),
        sum(when(a =!= 0 && y, 1L).otherwise(0L)).as("s1")).head()
    batch.sparkSession.createDataFrame(Seq((bid,
        if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3))))
      .toDF("batch_id", "d0", "d1", "s0", "s1")
  }

  /** Verdict over the ledger ≤ bid: cumulative counts, per-look pinned
    * p, running min — the q312 tree on the batch grid. */
  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    val w = Window.orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ledger
      .withColumn("n0", sum(col("d0")).over(w))
      .withColumn("n1", sum(col("d1")).over(w))
      .withColumn("x0", sum(col("s0")).over(w))
      .withColumn("x1", sum(col("s1")).over(w))
      .withColumn("__pp",
        when(col("n0") > 0 && col("n1") > 0,
          (col("x0") + col("x1")).cast("double") /
            (col("n0") + col("n1")).cast("double")))
      .withColumn("__p",
        when(col("__pp") > 0 && col("__pp") < 1, {
          val delta = col("x1").cast("double") / col("n1").cast("double") -
            col("x0").cast("double") / col("n0").cast("double")
          val v = col("__pp") * (lit(1.0) - col("__pp")) *
            (lit(1.0) / col("n0").cast("double") +
              lit(1.0) / col("n1").cast("double"))
          round(least(lit(1.0), lit(1.0) /
            (sqrt(v / (v + lit(tau))) *
              exp(delta * delta * lit(tau) /
                (lit(2.0) * v * (v + lit(tau)))))), 6)
        }).otherwise(lit(1.0)))
    cum.withColumn("p_anytime", min(col("__p")).over(w))
      .filter(col("batch_id") === bid)
      .select(col("batch_id"), col("n0"), col("n1"), col("x0"), col("x1"),
        col("p_anytime"), (col("p_anytime") <= alpha).as("significant"))
  }
}

object AnytimeMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, armCol: String, successCol: String,
            checkpointDir: String, tau: Double = 1e-4,
            alpha: Double = 0.05): StreamingQuery =
    new AnytimeMonitor(store, ledgerTable, resultTable, armCol,
      successCol, tau, alpha).start(stream, checkpointDir)

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, armCol: String,
                 successCol: String, tau: Double, alpha: Double): Unit =
    new AnytimeMonitor(store, ledgerTable, resultTable, armCol,
      successCol, tau, alpha).applyBatch(batch, bid)
}
