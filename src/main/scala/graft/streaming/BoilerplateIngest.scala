package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Boilerplate
import graft.store.DocumentStore

/** Streaming boilerplate maintenance — [[graft.operators.Boilerplate]]
  * made continuous (the q93/q181/q192 incremental discipline): the
  * segment document-frequency table is a STANDING store table that each
  * micro-batch advances by its own delta, and each batch's documents
  * are cleaned against the state as of THEIR arrival. A template that
  * becomes chrome mid-stream starts being stripped the trigger its df
  * crosses `minDf` — earlier admissions keep their as-written cleaning
  * (an honest ledger, not a retroactive rewrite; a periodic batch
  * re-clean with q226 is the compaction story, exactly like the dedup
  * family's).
  *
  * Replay exactness (foreachBatch may re-run a batch after a crash):
  * the `docsTable` ledger records every applied doc id, and only
  * UNSEEN docs contribute df deltas — a replayed batch contributes
  * zero delta, re-cleans against the identical post-batch state, and
  * re-upserts identical rows (effective exactly-once). Without the
  * ledger a replay would double every touched segment's df and could
  * flip later cleaning decisions.
  *
  * Scale shape per batch: segmenting is narrow; the delta aggregate
  * and the df upsert touch only the BATCH's segments (the store
  * upsert rewrites only touched buckets); the hot set broadcast into
  * the cleaning anti-join is small by the q204/q226 counting argument.
  * Nothing corpus-scale runs per trigger — cost tracks the batch. */
object BoilerplateIngest {

  def start(stream: DataFrame, store: DocumentStore, dfTable: String,
            docsTable: String, cleanTable: String, idCol: String,
            textCol: String, checkpointDir: String,
            segWords: Int = 10, minDf: Long = 5L): StreamingQuery = {
    require(segWords >= 1, s"bad segWords=$segWords")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyBatch(batch, store, dfTable, docsTable,
          cleanTable, idCol, textCol, segWords, minDf)
        ()
      }
      .start()
  }

  /** One maintenance round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, store: DocumentStore, dfTable: String,
                 docsTable: String, cleanTable: String, idCol: String,
                 textCol: String, segWords: Int, minDf: Long): Unit = {
    // replay guard: only docs the ledger has never seen contribute df
    val newDocs =
      if (store.exists(docsTable))
        batch.join(store.read(docsTable), Seq(idCol), "left_anti")
      else batch
    val delta = Boilerplate.segments(newDocs, idCol, textCol, segWords)
      .groupBy(col("__seg")).agg(countDistinct(col("__id")).as("__d"))
    val updated =
      if (store.exists(dfTable))
        delta.join(store.read(dfTable), Seq("__seg"), "left")
          .select(col("__seg"),
            (coalesce(col("df"), lit(0L)) + col("__d")).as("df"))
      else delta.select(col("__seg"), col("__d").as("df"))
    if (store.exists(dfTable)) store.upsert(dfTable, updated, Seq("__seg"))
    else store.create(dfTable, updated)
    val ids = newDocs.select(col(idCol)).distinct()
    if (store.exists(docsTable)) store.upsert(docsTable, ids, Seq(idCol))
    else store.create(docsTable, ids)
    // clean the WHOLE batch (replays included) against the post-batch state
    val hot = store.read(dfTable).filter(col("df") >= minDf).select(col("__seg"))
    val cleaned = Boilerplate.removeAgainst(batch, idCol, textCol, segWords, hot)
    if (store.exists(cleanTable)) store.upsert(cleanTable, cleaned, Seq(idCol))
    else store.create(cleanTable, cleaned)
  }
}
