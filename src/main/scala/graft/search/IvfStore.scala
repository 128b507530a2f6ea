package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.DocumentStore

/** IVF index living in the versioned [[DocumentStore]]: the reference's
  * point add/remove path (AddRemoveData.cs:64-105 — "searchable in near
  * real-time") done scale-correctly.
  *
  * The corpus is stored partitioned by `centroid_id`. Incremental
  * maintenance then has the right cost model:
  *  - `add` assigns new vectors to their (frozen) centroids and upserts —
  *    the COW store rewrites ONLY the touched centroid partitions, and
  *    the commit is one atomic manifest swap, after which the vectors are
  *    immediately searchable;
  *  - `remove` locates the victims' partitions with a pruned key scan and
  *    rewrites only those;
  *  - `search` reads only the `nprobe` probed centroid partitions via
  *    manifest-level pruning (unprobed segments are never listed).
  *
  * Centroids are frozen at build time (standard IVF practice — drift is
  * handled by periodic rebuild, not per-write retraining; the reference
  * likewise never retrains its index on add/remove).
  */
final class IvfStore(store: DocumentStore, table: String, val index: IvfIndex,
                     vecCol: String, idCol: String) {

  /** Bulk build: assign every vector, write partitioned by centroid. */
  def build(df: DataFrame): Unit =
    store.create(table, index.assign(df, vecCol), partitionCol = Some("centroid_id"))

  /** Incremental add/replace (vectorize-on-write upstream of this call).
    * Keyed on id ALONE: a re-embedded vector can land on a different
    * centroid, and keying on (id, centroid) would strand the stale copy
    * in its old partition. The store detects the partition move with a
    * column-pruned key scan and rewrites old + new partitions. */
  def add(df: DataFrame): Unit =
    store.upsert(table, index.assign(df, vecCol), keys = Seq(idCol))

  /** Point/bulk remove by id. The victims' partitions are located with a
    * column-pruned id scan so the rewrite touches only those. */
  def remove(ids: Seq[Long]): Unit = {
    // A missing/empty table reads as a zero-column frame, where the id
    // filter would fail analysis — removing from nothing is a no-op.
    if (!store.exists(table) || store.read(table).columns.isEmpty) return
    val parts = store.read(table)
      .filter(col(idCol).isin(ids: _*))
      .select(col("centroid_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (parts.nonEmpty)
      store.delete(table, col(idCol).isin(ids: _*), touchedParts = Some(parts))
  }

  /** Mean cosine of each stored vector to ITS assigned centroid — the
    * index-health scalar. Frozen centroids (standard IVF practice) stay
    * optimal only while ingest resembles the training distribution;
    * continuous drift pushes vectors toward list boundaries, recall
    * decays at fixed nprobe, and THIS number is the signal. One narrow
    * scan with the centroids broadcast back by id; cost is a corpus
    * pass, so it is the periodic health check, not a per-write one. */
  def assignmentQuality: Double = {
    if (!store.exists(table)) return 0.0
    val rows = store.read(table)
    if (rows.columns.isEmpty) return 0.0
    val spark = rows.sparkSession
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    val cdf = spark.createDataFrame(cents).toDF("centroid_id", "__cent")
      .withColumn("__cent", col("__cent").cast("array<float>"))
    rows.join(broadcast(cdf), "centroid_id")
      .agg(avg(graft.functions.VectorFunctions.cosine_sim(col(vecCol), col("__cent"))))
      .head().getDouble(0)
  }

  /** Retrain the centroids on the CURRENT corpus and rebuild the index
    * table — the drift remedy (the per-write alternative, updating
    * centroids incrementally, destabilizes every existing assignment;
    * production IVF systems retrain periodically instead). Safe against
    * the read-while-overwrite hazard because the store is COW: the
    * rebuild writes a new version while the old segment files keep
    * serving the extraction scan. Returns the wrapper around the fresh
    * index; the old one keeps serving until dropped. */
  def rebuilt(iters: Int = 5, trainPointsPerList: Int = 256): IvfStore = {
    val rows = store.read(table).drop("centroid_id").dropDuplicates(idCol)
    val fresh = IvfIndex.train(rows, vecCol, idCol, index.numLists, iters,
      index.multiAssign, trainPointsPerList)
    val next = new IvfStore(store, table, fresh, vecCol, idCol)
    next.build(rows)
    next
  }

  /** ANN search over the stored index: only the nprobe nearest centroid
    * partitions are read (manifest pruning), exact top-k within them.
    * `pred` (filtered search) applies to the pruned candidate stream —
    * the store rows carry the full corpus columns, so partition pruning
    * and the metadata predicate compose in one scan. */
  def search(probe: Array[Float], k: Int, nprobe: Int = 1,
             pred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val lists = index.nearestLists(probe, nprobe).map(_.toString)
    val pruned = store.readPartitions(table, lists)
    if (pruned.columns.isEmpty) pruned
    else {
      val cand0 = if (index.multiAssign <= 1) pruned else pruned.dropDuplicates(idCol)
      val cand = pred.map(cand0.filter).getOrElse(cand0)
      VectorSearch.exactTopK(cand, vecCol, idCol, probe, k)
    }
  }
}
