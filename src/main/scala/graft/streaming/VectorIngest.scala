package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.embed.{Embed, Embedder}
import graft.store.DocumentStore

/** Streaming vectorize-on-write: the continuous form of
  * [[graft.rag.ChatEngine.ingest]] — the reference vectorizes documents
  * as they are written (Vectorize/Program.cs change-feed listener: each
  * changed document is embedded and upserted back); here the change
  * feed is a Structured Streaming source and the sink is the engine's
  * own [[DocumentStore]].
  *
  * Delivery semantics: foreachBatch may replay a micro-batch after a
  * failure, but the sink is a KEYED upsert, so replays converge to the
  * same store state (effective exactly-once per key — the same
  * idempotent-sink argument the reference's upsert listener relies on).
  * In-batch duplicates for one key are resolved BEFORE the upsert:
  * highest `versionCol` wins when given, otherwise an arbitrary-but-
  * single row per key (at-least-once feeds re-deliver current state,
  * so any copy is acceptable there).
  *
  * Scale notes: each micro-batch pays one embed pass (the CPU-heavy
  * stage, spread across the cluster by [[Embed.withEmbedding]]) and one
  * keyed upsert (rewrites only the partitions holding touched keys).
  * State lives in the store + checkpoint, not executor memory, so an
  * arbitrarily long-running stream holds no growing state. Each
  * micro-batch's rewrite leaves however many files its tasks wrote, so
  * a long-running stream fragments its touched partitions —
  * `compactEvery = n` folds the OPTIMIZE pass into every n-th batch
  * (a normal committed version; readers never block, replays stay
  * idempotent because compaction moves no rows).
  */
object VectorIngest {

  def start(stream: DataFrame, store: DocumentStore, table: String,
            embedder: Embedder, idCol: String, textCol: String,
            checkpointDir: String,
            vectorCol: String = "vector",
            versionCol: Option[String] = None,
            maxInputTokens: Option[Int] = None,
            codec: graft.functions.TokenCodec = graft.functions.Tokenizer,
            partitionCol: Option[String] = None,
            compactEvery: Int = 0,
            compactMaxFileBytes: Long = 128L << 20): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val one = onePerKey(batch, idCol, versionCol)
          // persist: upsert walks its input up to three times (partition
          // discovery, victim scan, segment write) and the embed pass is
          // the expensive stage — without the pin it would rerun per walk
          val withVec = Embed.withEmbedding(one, textCol, vectorCol, embedder,
            maxInputTokens = maxInputTokens, codec = codec).persist()
          try {
            if (store.exists(table)) store.upsert(table, withVec, Seq(idCol))
            else store.create(table, withVec, partitionCol)
          } finally withVec.unpersist()
          // keyed on batchId so a replayed batch repeats the same
          // decision — compaction itself is row-preserving either way
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
            store.compact(table, compactMaxFileBytes)
        }
        ()
      }
      .start()

  /** Collapse in-batch duplicates to one row per key (max `versionCol`
    * when present — ties broken arbitrarily, as are the no-version
    * duplicates: a change feed re-delivers whole current states, so any
    * surviving copy is a valid one). */
  private def onePerKey(batch: DataFrame, idCol: String, versionCol: Option[String]): DataFrame =
    versionCol match {
      case None => batch.dropDuplicates(idCol)
      case Some(vc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col(vc).desc)
        batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }
}
