package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.store.DocumentStore

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
    * need an explicit schema; we reuse the batch-inferred one (nanos ts
    * arrives as long under the session's nanosAsLong conf and is rebuilt
    * to a micro-precision timestamp like Tables.t). */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
}
