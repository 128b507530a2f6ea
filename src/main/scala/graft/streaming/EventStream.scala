package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.store.DocumentStore

/** One closed session: contiguous activity of a user with gaps below the
  * threshold (the streaming form of the batch q24 sessionization).
  * Top-level (not nested in the object) so the Product encoder's codegen
  * sees a reachable constructor. */
case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                       session_end: java.sql.Timestamp, n_events: Int)

/** Open-session state carried between micro-batches. */
case class SessState(start: Long, end: Long, n: Int)

/** Emit-once threshold crossing: the key's `threshold`-th event.
  * Top-level for the same encoder-codegen reason as [[UserSession]]. */
case class ThresholdAlert(user_id: Long, event_id: Long, n_at: Int)

/** Per-key cumulative arrival count carried between micro-batches. */
case class CountState(n: Long)

/** Structured-Streaming extension (SURVEY §2.12).
  *
  * The reference has no streaming engine — its "near real-time" story is
  * point add/remove (AddRemoveData.cs:64-105) plus the incremental
  * per-session token sum (A1, ChatService.cs:314-316). Both generalize
  * here: the `events` table drives (a) watermarked windowed aggregation,
  * (b) stateful running totals per key (A1 as streaming state), and
  * (c) a foreachBatch upsert sink into the versioned store (incremental
  * corpus maintenance).
  */
object EventStream {

  /** File-stream source over an events-shaped directory. File streams
    * need an explicit schema; we reuse the batch-inferred one and
    * normalize `ts` exactly like Tables.t: nanos-as-long is rebuilt to a
    * micro-precision timestamp, and TIMESTAMP_NTZ (micros parquet with
    * isAdjustedToUTC=false) is cast to the instant-typed TIMESTAMP that
    * `withWatermark` requires (session tz is UTC, so wall values hold). */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** (a) Watermarked sliding-window aggregation: event counts + value
    * sums per (window, event_type); late data beyond 10 min dropped. */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
                    slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** (b) A1 as streaming state: per-user running value total maintained
    * in mapGroupsWithState (the Session.TokensUsed increment,
    * ChatService.cs:314-316, as distributed state). Emits the updated
    * total per user per micro-batch. */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    case class E(user_id: Long, value: Double)
    val typed = events.select(col("user_id"), col("value")).as[(Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[Double, (Long, Double)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val prev = state.getOption.getOrElse(0.0)
          val next = prev + rows.map(_._2).sum
          state.update(next)
          (user, next)
      }.toDF("user_id", "running_total")
  }

  /** (b2) Gap sessionization as streaming state: flatMapGroupsWithState
    * with an event-time timeout. A session closes (and is emitted) when
    * its user is idle past `gapMinutes` of event time — the watermark
    * drives the timeout, so state is bounded even with millions of users.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    // state tracks MICROSECONDS (Timestamp.getTime would truncate to
    // millis and shift session bounds off the batch answer)
    val gapUs = gapMinutes * 60L * 1000000L
    def toTs(us: Long) = DateTimeUtils.toJavaTimestamp(us)
    val typed = events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator(UserSession(user, toTs(s.start), toTs(s.end), s.n))
          } else {
            val ts = rows.map(r => DateTimeUtils.fromJavaTimestamp(r._2)).toSeq.sorted
            var closed = List.empty[UserSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                // merge = within gap of the session INTERVAL, extending
                // either end — a late (out-of-order but within-watermark)
                // event can precede the open session's start
                case Some(s) if t >= s.start - gapUs && t - s.end <= gapUs =>
                  cur = Some(SessState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) if t > s.end =>
                  closed ::= UserSession(user, toTs(s.start), toTs(s.end), s.n)
                  cur = Some(SessState(t, t, 1))
                case Some(_) =>
                  // straggler older than start-gap: its own (already past)
                  // session; emit closed without disturbing the open one
                  closed ::= UserSession(user, toTs(t), toTs(t), 1)
                case None => cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout is wall-alignment only — millis precision is fine
              state.setTimeoutTimestamp((s.end + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }.toDF()
  }

  /** (b3) Emit-ONCE threshold alerts: fire exactly one row per key, at
    * the moment its cumulative event count crosses `threshold` — the
    * "user hit their rate cap" / "document family exceeded N versions"
    * monitor. This is genuinely stateful-emit-once semantics: a plain
    * streaming aggregation restates the count every batch and cannot
    * express "only the crossing", so the operator rides
    * flatMapGroupsWithState with one counter per key (state is a single
    * long — bounded by key cardinality, not stream length).
    *
    * The emitted row identifies the CROSSING EVENT: within a batch rows
    * are ordered by (ts, event_id); across batches arrival order stands
    * in for event time, so determinism requires the source's batches be
    * event-time ordered (time-partitioned arrival — the same contract
    * the session gates stage with `byRange`). */
  def thresholdAlerts(spark: SparkSession, events: DataFrame,
                      threshold: Int): DataFrame = {
    require(threshold >= 1, s"bad threshold $threshold")
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val typed = events.select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CountState, ThresholdAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[CountState]) =>
          val prev = state.getOption.map(_.n).getOrElse(0L)
          val batch = rows.toSeq
          state.update(CountState(prev + batch.size))
          if (prev >= threshold || prev + batch.size < threshold) Iterator.empty
          else {
            val sorted = batch
              .sortBy(r => (DateTimeUtils.fromJavaTimestamp(r._3), r._2))
            Iterator(ThresholdAlert(user,
              sorted((threshold - prev - 1).toInt)._2, threshold))
          }
      }.toDF()
  }

  /** (d) Streaming exact dedup, state bounded by the watermark: an event
    * id seen once within the watermark horizon is dropped on re-arrival;
    * state for ids older than the horizon is evicted (unbounded
    * `dropDuplicates` state would OOM a 100 TB/day stream). `tsCol` must
    * be the event-time column the watermark is defined on. */
  def dedup(events: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
            watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** (e) Stream-static enrichment join: the static dimension is planned
    * as a broadcast per micro-batch (re-resolved each batch, so slowly-
    * changing dimensions pick up updates); no stream-side shuffle. */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** (f) Stream-stream interval join, both sides watermarked so Spark
    * evicts buffered rows once the watermark clears the interval bound
    * (an unbounded stream-stream join buffers one side forever — the
    * canonical streaming-state OOM at 100 TB/day). Pairs each `right`
    * row with the same-key `left` rows whose event time falls within
    * `[r_ts − before, r_ts]` — the streaming form of the batch funnel
    * range join (q54). Output columns are prefixed `l_`/`r_`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String = "ts", idCol: String = "event_id",
                   before: String = "1 hour",
                   watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.select(col(key).as("l_key"), col(tsCol).as("l_ts"),
        col(idCol).as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("r_key"), col(tsCol).as("r_ts"),
        col(idCol).as("r_id"))
      .withWatermark("r_ts", watermark)
    // leftOuter: an unmatched left row emits null-extended only once the
    // watermark clears l_ts + before (no future right row can match it) —
    // the same eviction bound that caps the buffered state, so "did this
    // view convert within the hour: NO" is itself a streaming answer,
    // delivered exactly when it becomes decidable
    l.join(r,
      col("l_key") === col("r_key") &&
        col("l_ts") <= col("r_ts") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $before"),
      joinType)
      .select(col("l_key").as("key"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"))
  }

  /** (c) foreachBatch upsert sink: each micro-batch is one atomic store
    * commit (the streaming form of the reference's vectorize-on-write
    * add path). */
  def upsertSink(events: DataFrame, store: DocumentStore, table: String,
                 keys: Seq[String], checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (store.exists(table)) store.upsert(table, batch, keys)
          else store.create(table, batch)
        }
      }
      .start()

  /** (g) CDC apply-changes sink: a mixed mutation stream (rows tagged
    * `opCol` ∈ {'upsert','delete'}, ordered by `seqCol`) applied to the
    * versioned store — the full AddRemoveData.cs surface (add AND
    * remove) as a stream, and the write half of the APPLY CHANGES
    * pattern. Within each micro-batch the LAST operation per key wins
    * (standard CDC batch-collapse: an upsert superseded by a delete in
    * the same batch nets to the delete — without the collapse the two
    * would apply in arbitrary order); each micro-batch is one-or-two
    * atomic store commits, replay-idempotent because the collapse is
    * deterministic and upsert/delete are keyed. */
  def cdcApplySink(changes: DataFrame, store: DocumentStore, table: String,
                   keys: Seq[String], opCol: String, seqCol: String,
                   checkpoint: String): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
          val latest = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn").cache()
          val ups = latest.filter(col(opCol) === "upsert").drop(opCol, seqCol)
          val dels = latest.filter(col(opCol) === "delete")
            .select(keys.map(col): _*)
          if (!ups.isEmpty) {
            if (store.exists(table)) store.upsert(table, ups, keys)
            else store.create(table, ups)
          }
          // keyed anti-join delete: the delete keys stay a DataFrame end
          // to end (no driver collect, no isin expression tree), and the
          // key may be compound — the reference's own mutation key is
          // (Type, SessionId, Id) (MongoDbService.cs:573-575). A
          // delete-heavy micro-batch (retention purge, tenant
          // offboarding) costs one anti-join over the touched partitions.
          if (store.exists(table) && !dels.isEmpty) store.delete(table, dels, keys)
          latest.unpersist()
          ()
        }
      }
      .start()
}
