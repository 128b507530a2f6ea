package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.AllPairs
import graft.store.DocumentStore

/** Streaming near-duplicate ADMISSION gate: each micro-batch document
  * is scored against the standing corpus (and the earlier part of its
  * own batch) with [[AllPairs.admissionMatches]]; near-copies are routed
  * to a quarantine table WITH their best-match evidence, everything else
  * is admitted into the corpus table. This is the q181 incremental
  * all-pairs gate made continuous — the ingestion-time complement of
  * the batch dedup family: rejecting a near-copy at the door costs
  * batch-proportional work, while admitting it costs a corpus-scale
  * dedup pass later (plus every training run that double-samples the
  * duplicate in the meantime). The reference ingests trust-the-blob
  * (IngestAndVectorize.cs:31-59); this is the curation layer in front.
  *
  * Decision rule (deterministic): a batch document is REJECTED iff it
  * scores ≥ threshold against any standing-corpus document or any
  * SMALLER-id document of its own batch (first-wins — the smaller id
  * survives unless it matches something itself). Its quarantine row
  * carries the single best match: highest cosine, ties to the smallest
  * matched id. Weights are computed over corpus ∪ batch, so idf is
  * never staler than the decision it guards (the q181 contract).
  *
  * Replay exactness (foreachBatch may re-run a batch after a crash):
  * both sinks are keyed upserts, and the corpus side EXCLUDES the
  * batch's own ids before scoring — on replay after a partial
  * admission, the scoring corpus is therefore exactly the pre-batch
  * corpus again, the weights/df/N reproduce bit-for-bit, and the
  * replayed decisions (and upserts) are identical. Without that
  * exclusion a replayed batch would find its own earlier write, double
  * the df of its terms, and could flip a borderline decision.
  *
  * Scale shape per batch: one weighted-posting build over corpus ∪
  * batch (the corpus-side tf table is the expensive stage; at 100 TB
  * keep the corpus postings as a maintained table — the
  * [[graft.search.InvertedIndex]] machinery — rather than recomputing;
  * this sink states the SEMANTICS, the persisted-index serve is the
  * optimization), one batch-keyed candidate join bounded by
  * Σ_t df_batch(t)·df_corpus∪batch(t), two keyed upserts. */
object AdmissionIngest {

  def start(stream: DataFrame, store: DocumentStore, corpusTable: String,
            quarantineTable: String, idCol: String, textCol: String,
            checkpointDir: String, threshold: Double,
            maxDf: Option[Long] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyBatch(batch, store, corpusTable,
          quarantineTable, idCol, textCol, threshold, maxDf)
        ()
      }
      .start()

  /** One admission round — exposed for batch replay/oracle use. */
  def applyBatch(batch: DataFrame, store: DocumentStore, corpusTable: String,
                 quarantineTable: String, idCol: String, textCol: String,
                 threshold: Double, maxDf: Option[Long]): Unit = {
    val one = batch.select(col(idCol), col(textCol))
      .dropDuplicates(idCol).persist()
    try {
      // replay exactness: drop the batch's own ids from the corpus view
      // so a re-run after partial admission scores against the same
      // pre-batch corpus state
      val corpus =
        if (store.exists(corpusTable))
          store.read(corpusTable).select(col(idCol), col(textCol))
            .join(one.select(col(idCol)), Seq(idCol), "left_anti")
        else one.limit(0)
      val matches = AllPairs.admissionMatches(one, corpus, idCol, textCol,
        threshold, maxDf)
      val best = matches
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("batch_id"))
            .orderBy(col("cos").desc, col("matched_id"))))
        .filter(col("__rn") === 1)
        .select(col("batch_id").as(idCol), col("matched_id"), col("cos"))
        .persist()
      try {
        val quarantined = one.join(best, Seq(idCol))
          .select(col(idCol), col(textCol), col("matched_id"), col("cos"))
        val admitted = one.join(best.select(col(idCol)), Seq(idCol), "left_anti")
        if (!quarantined.isEmpty) {
          if (store.exists(quarantineTable))
            store.upsert(quarantineTable, quarantined, Seq(idCol))
          else store.create(quarantineTable, quarantined)
        }
        if (!admitted.isEmpty) {
          if (store.exists(corpusTable))
            store.upsert(corpusTable, admitted, Seq(idCol))
          else store.create(corpusTable, admitted)
          // corpus ∪ quarantine must PARTITION the input (the q192
          // accounting invariant): an id quarantined in an earlier batch
          // and legitimately re-admitted now (e.g. the conflicting corpus
          // doc was removed in between) would otherwise keep its stale
          // quarantine row. Deleting the admitted ids restores the
          // partition; replay-safe because a re-run re-admits the same
          // ids and the delete of already-absent keys is a no-op.
          if (store.exists(quarantineTable)) {
            val q = store.read(quarantineTable) // fully-emptied → column-less
            if (q.columns.contains(idCol)) {
              val stale = admitted.select(col(idCol)).join(q.select(col(idCol)), Seq(idCol))
              if (!stale.isEmpty) store.delete(quarantineTable, stale, Seq(idCol))
            }
          }
        }
      } finally best.unpersist(blocking = false)
    } finally one.unpersist(blocking = false)
  }
}
