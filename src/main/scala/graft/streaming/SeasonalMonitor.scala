package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.DocumentStore

/** Streaming seasonality-aware volume monitor — the continuous face of
  * [[graft.operators.Seasonal]], on the [[LedgerMonitor]] discipline
  * (ledger-less: the verdict compares each batch against a FIXED
  * per-period-position baseline, no cumulative state): every
  * micro-batch's HOURLY value totals are compared against the mean
  * hourly total the reference window established, and a bucket whose
  * deviation clears the threshold alerts. A raw-volume threshold
  * false-alarms every midnight and sleeps through a daytime drop; the
  * seasonal baseline is what makes "this hour is wrong" well-posed per
  * hour-of-day. (DriftMonitor watches the value DISTRIBUTION; this
  * watches seasonal VOLUME — the two standing stream audits a feed
  * needs.)
  *
  * The alert rule is RELATIVE — deviation ≥ (ratioNum/ratioDen) of the
  * seasonal baseline — because an absolute threshold cannot serve two
  * traffic scales (what is noise at 10× volume is an outage at 1×); the
  * ratio form is scale-free. And it is EXACT-ARITHMETIC end to end:
  * baseline rows carry the exact DECIMAL sum `sn` and integer hour
  * count `sc` per position (never a pre-divided float mean); a batch
  * bucket with total v (exact DECIMAL) alerts iff
  *   |v·sc − sn| · ratioDen ≥ ratioNum · |sn|
  * — all DECIMAL/BIGINT products, no float on the boundary, so the
  * verdict replays bit-for-bit in SQL and across partitionings.
  *
  * Replay exactness is the base's (keyed upserts on (batch_id, hour)
  * against an immutable baseline). An all-NULL-timestamp batch yields
  * no hourly buckets: no row is recorded, never a spurious alert.
  *
  * Scale shape per batch: one map-side-combined hour aggregate over the
  * batch + a broadcast join against the ≤ `periodHours`-row baseline;
  * cost tracks the batch. */
final class SeasonalMonitor(
    protected val store: DocumentStore, result: String,
    baseline: DataFrame, tsCol: String, valueCol: String,
    ratioNum: Long, ratioDen: Long, periodHours: Int) extends LedgerMonitor {

  require(ratioNum > 0 && ratioDen > 0,
    s"ratio must be positive, got $ratioNum/$ratioDen")

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id", "hour")

  /** Ledger-less: the census is the batch itself (the frame the hourly
    * verdict consumes; timestamps NULL-filter in the verdict). */
  protected def census(batch: DataFrame, bid: Long): DataFrame = batch

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    val hourly = census
      .filter(col(tsCol).isNotNull)
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)")
        .as("v"))
      // epoch-hour position (see Seasonal.decompose): hour-of-day only
      // covers periods dividing 24; baseline join keys must agree with
      // the decomposition's labeling for ANY periodHours
      .withColumn("pos",
        pmod(floor(unix_timestamp(col("hour")) / 3600).cast("long"),
          lit(periodHours.toLong)).cast("int"))
    hourly.join(broadcast(baseline), "pos")
      .select(lit(bid).as("batch_id"), col("hour"), col("pos"),
        col("v").cast("double").as("v"),
        (col("sn").cast("double") / col("sc").cast("double"))
          .as("baseline_mean"),
        (col("v").cast("double") -
          col("sn").cast("double") / col("sc").cast("double"))
          .as("deviation"),
        // exact scale-free boundary: |v·sc − sn|·ratioDen ≥ ratioNum·|sn|
        // — DECIMAL/BIGINT only, no float on the decision
        (abs(col("v") * col("sc") - col("sn")) * ratioDen >=
          abs(col("sn")) * ratioNum).as("alert"))
  }
}

object SeasonalMonitor {

  /** `baseline`: (pos INT, sn DECIMAL — exact sum of hourly totals at
    * that position, sc BIGINT — number of hours summed). Validated
    * once: non-empty, unique positions, positive counts. */
  def start(stream: DataFrame, store: DocumentStore, resultTable: String,
            baseline: DataFrame, tsCol: String, valueCol: String,
            checkpointDir: String, ratioNum: Long, ratioDen: Long,
            periodHours: Int = 24): StreamingQuery = {
    val b = baseline.select(col("pos").cast("int").as("pos"),
      col("sn").cast("decimal(38,2)").as("sn"),
      col("sc").cast("long").as("sc"))
    val shape = b.agg(count(lit(1)).as("n"), countDistinct(col("pos")).as("d"),
      min(col("sc")).as("mn")).head()
    require(shape.getLong(0) > 0, "SeasonalMonitor: baseline must be non-empty")
    require(shape.getLong(0) == shape.getLong(1),
      "SeasonalMonitor: baseline positions must be unique")
    require(shape.getLong(2) > 0,
      "SeasonalMonitor: baseline counts must be positive")
    val pinned = b.cache()
    pinned.count()
    new SeasonalMonitor(store, resultTable, pinned, tsCol, valueCol,
      ratioNum, ratioDen, periodHours).start(stream, checkpointDir)
  }

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 resultTable: String, baseline: DataFrame, tsCol: String,
                 valueCol: String, ratioNum: Long, ratioDen: Long,
                 periodHours: Int = 24): Unit =
    new SeasonalMonitor(store, resultTable, baseline, tsCol, valueCol,
      ratioNum, ratioDen, periodHours).applyBatch(batch, bid)
}
