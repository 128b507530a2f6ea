package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.rag.SemanticCache
import graft.store.DocumentStore

/** Streaming serve-or-admit: the continuous form of
  * [[graft.rag.SemanticCache.serveAndAdmit]] — incoming questions
  * arrive as a Structured Streaming source, each micro-batch is looked
  * up against the store-backed cache table, verdicts land in a result
  * sink, and the batch's misses are ADMITTED before the next trigger —
  * so a question asked in batch k serves any paraphrase from batch
  * k+1 onward. Within a batch, probes see only the pre-batch cache
  * (admits commit at batch end — micro-batch semantics, which the
  * q430 oracle replays batch by batch).
  *
  * Delivery semantics: admits go through [[DocumentStore.upsert]] on
  * the id key, so a replayed batch re-admits the same rows onto
  * themselves (idempotent cache); result rows carry the batch id, so a
  * replay writes duplicate (batch, probe) rows that a downstream
  * reader dedupes by that key — same contract as [[LedgerMonitor]]'s
  * replayed-batch discipline.
  *
  * Scale notes: per trigger, one broadcast of the (small) probe batch
  * against the cache scan — no cache shuffle; the admit is the store's
  * touched-partition COW. Cache state lives in the store + checkpoint;
  * executors hold nothing across batches. */
object CacheIngest {

  def start(questions: DataFrame, store: DocumentStore, cacheTable: String,
      idCol: String, vecCol: String, threshold: Double,
      resultDir: String, checkpointDir: String): StreamingQuery =
    questions.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val cache = store.read(cacheTable).select(col(idCol), col(vecCol))
          // two consumers in separate actions (result write, then the
          // admit) — persist so the lookup's cache pass runs once per
          // trigger (the IndexIngest discipline)
          val res = SemanticCache.lookup(batch, idCol, vecCol,
            cache, idCol, vecCol, threshold).persist()
          try {
            res.withColumn("batch", lit(batchId))
              .write.mode("append").parquet(resultDir)
            val misses = batch
              .join(res.filter(!col("hit")).select(col("probe_id").as(idCol)),
                Seq(idCol))
              .select(col(idCol), col(vecCol))
            if (!misses.isEmpty) store.upsert(cacheTable, misses, Seq(idCol))
          } finally { res.unpersist(); () }
        }
        ()
      }
      .start()
}
