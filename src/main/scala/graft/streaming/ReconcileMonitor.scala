package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.DocumentStore

/** Streaming reconciliation monitor — the q353 batch audit made
  * continuous on the [[LedgerMonitor]] ledger discipline, and the
  * base's first INTEGRITY-class monitor (the other eight watch a
  * distribution; this one watches an invariant): each micro-batch
  * carries child rows denormalized with their parent's STATED total
  * (the unit-of-work contract: a parent's children arrive within one
  * batch — the per-order/per-invoice feed shape), the batch's per-key
  * child sums band against the stated totals by exact integer
  * cross-multiplication (the q353 bands), and the verdict alerts when
  * any key lands beyond 10% — with the cumulative beyond count read
  * from the persisted ledger, never from state.
  *
  * Column contracts: the key column is an opaque grouping handle (any
  * type — string invoice ids group as-is); the two cents columns must
  * be exact integers (the bands are integer cross-multiplication), and
  * a cents value that does not cast to long refuses the batch loudly.
  *
  * Bands: 0_conflict (one key stated two ways inside a batch — a feed
  * bug the monitor must SURFACE, not average away), 1_exact,
  * 2_within_0_1pct, 3_within_1pct, 4_within_10pct, 5_beyond_10pct.
  *
  * Replay exactness is the base's (keyed (batch_id, band) ledger
  * upserts, batch-bounded cumulative read); every band decision is
  * integer arithmetic on exact cents. An all-NULL batch records a
  * zero row and never alerts (the base's contract).
  *
  * Scale shape per trigger: one key rollup over the batch + a 6-row
  * band census; verdict state is (batches × 6) ledger rows. */
final class ReconcileMonitor(
    protected val store: DocumentStore,
    ledger: String, result: String, keyCol: String,
    childCentsCol: String, statedCentsCol: String) extends LedgerMonitor {

  protected def resultTable: String = result
  protected def resultKeys: Seq[String] = Seq("batch_id")
  override protected def ledgerTable: Option[String] = Some(ledger)
  override protected def ledgerKeys: Seq[String] = Seq("batch_id", "band")

  protected def census(batch: DataFrame, bid: Long): DataFrame = {
    // The key is only a GROUPING handle — never cast it (an r16 advisor
    // finding: casting string invoice ids to long nulled every row and
    // the monitor wrote a clean zero verdict instead of alerting). The
    // cents columns DO carry an integer contract (exact-band arithmetic
    // needs exact longs), so a cast that nulls a non-NULL cent value is
    // a feed-shape bug the monitor must refuse loudly, not filter away.
    val raw = batch.select(col(keyCol).cast("string").as("__k"),
        col(childCentsCol).as("__rc"), col(statedCentsCol).as("__rp"))
      .filter(col("__k").isNotNull && col("__rc").isNotNull &&
        col("__rp").isNotNull)
      .withColumn("__c", col("__rc").try_cast("long"))
      .withColumn("__p", col("__rp").try_cast("long"))
    // ONE pass over the batch: the blind count rides the key rollup
    // (an r17 advisor finding: a separate count() action re-scanned and
    // re-cast the whole micro-batch just to guard), and the ≤6-row band
    // census is collected locally so the base's write and the verdict's
    // reads never touch the batch lineage again.
    val perBand = raw.groupBy(col("__k"))
      .agg(sum(col("__c")).as("__cc"), max(col("__p")).as("__pp"),
        countDistinct(col("__p")).as("__ds"),
        sum(when(col("__c").isNull || col("__p").isNull, 1L)
          .otherwise(0L)).as("__blind"))
      .withColumn("__d", abs(col("__cc") - col("__pp")))
      .withColumn("band",
        when(col("__ds") > 1, "0_conflict")
          .when(col("__d") === 0, "1_exact")
          .when(col("__d") * 1000 <= abs(col("__pp")), "2_within_0_1pct")
          .when(col("__d") * 100 <= abs(col("__pp")), "3_within_1pct")
          .when(col("__d") * 10 <= abs(col("__pp")), "4_within_10pct")
          .otherwise("5_beyond_10pct"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_keys"), sum(col("__blind")).as("__blind"))
      .collect()
    val blinded = perBand.map(_.getLong(2)).sum
    require(blinded == 0,
      s"ReconcileMonitor: $blinded row(s) in batch $bid carry non-NULL " +
        s"cents ($childCentsCol/$statedCentsCol) that cast to NULL long " +
        "— the cents columns must be exact integers; refusing rather " +
        "than silently blinding the integrity monitor")
    val spark = batch.sparkSession
    import spark.implicits._
    perBand.map(r => (bid, r.getString(0), r.getLong(1))).toSeq
      .toDF("batch_id", "band", "n_keys")
  }

  protected def verdict(bid: Long, census: DataFrame,
                        ledger: DataFrame): DataFrame = {
    val spark = census.sparkSession
    def cnt(df: DataFrame, b: String) = {
      val r = df.filter(col("band") === b)
        .agg(coalesce(sum(col("n_keys")), lit(0L))).head()
      r.getLong(0)
    }
    val conflict = cnt(census, "0_conflict")
    val exact = cnt(census, "1_exact")
    val w01 = cnt(census, "2_within_0_1pct")
    val w1 = cnt(census, "3_within_1pct")
    val w10 = cnt(census, "4_within_10pct")
    val beyond = cnt(census, "5_beyond_10pct")
    // cumulative integrity debt from the PERSISTED ledger <= bid (the
    // base already wrote this batch's census rows)
    val cumBeyond = cnt(ledger, "5_beyond_10pct")
    spark.createDataFrame(Seq((bid,
        conflict + exact + w01 + w1 + w10 + beyond,
        conflict, exact, w01, w1, w10, beyond, cumBeyond,
        conflict > 0 || beyond > 0)))
      .toDF("batch_id", "n_keys", "n_conflict", "n_exact",
        "n_within_0_1", "n_within_1", "n_within_10", "n_beyond",
        "cum_beyond", "alert")
  }
}

object ReconcileMonitor {

  def start(stream: DataFrame, store: DocumentStore, ledgerTable: String,
            resultTable: String, keyCol: String, childCentsCol: String,
            statedCentsCol: String,
            checkpointDir: String): StreamingQuery =
    new ReconcileMonitor(store, ledgerTable, resultTable, keyCol,
      childCentsCol, statedCentsCol).start(stream, checkpointDir)

  /** One monitoring round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, bid: Long, store: DocumentStore,
                 ledgerTable: String, resultTable: String, keyCol: String,
                 childCentsCol: String, statedCentsCol: String): Unit =
    new ReconcileMonitor(store, ledgerTable, resultTable, keyCol,
      childCentsCol, statedCentsCol).applyBatch(batch, bid)
}
