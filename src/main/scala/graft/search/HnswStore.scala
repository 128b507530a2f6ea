package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HNSW index with incremental maintenance — the reference's point
  * add/remove path (AddRemoveData.cs:64-105 "searchable in near
  * real-time"; upsert MongoDbService.cs:241-269, delete :271-293) for
  * the segmented graph index, done the way every segment-architecture
  * ANN system does it (Lucene HNSW, Milvus growing/sealed segments):
  *
  *  - '''add''': the batch builds a NEW segment graph (embarrassingly
  *    parallel, never touches frozen segments) appended under the next
  *    generation number — searchable as soon as the append lands, since
  *    serve scans all segment rows. Ids already present (found with a
  *    distributed semi-join against the segments' id columns — never a
  *    corpus collect) are tombstoned at the current generation first,
  *    so an updated vector replaces its stale copy atomically-per-read.
  *  - '''remove''': an id tombstone stamped with the current generation.
  *    A tombstone kills rows in segments of generation ≤ its stamp —
  *    re-adding the id later (higher generation) resurrects it without
  *    touching the tombstone, exactly the Lucene liveDocs rule.
  *  - '''serve''': each segment counts its own dead ids and over-fetches
  *    just k + deadInSegment (NOT k + global tombstone count — a skewed
  *    delete pattern then only widens the beam where the dead actually
  *    live), the generation rule filters, and the global
  *    TakeOrderedAndProject merges. No graph is ever edited in place:
  *    in-place HNSW deletion breaks the navigability invariants the
  *    insert heuristic maintains, which is why no production system
  *    does it.
  *  - '''rebuild thresholds''': the store compacts — live (id, vector)
  *    rows are extracted from the segments (latest generation per id,
  *    tombstone rule applied) to a scratch parquet, the base is rebuilt
  *    from it at generation 0 with the configured segment count, and
  *    tombstones truncate — when EITHER trigger fires: tombstones
  *    exceed `maxTombstoneFrac` of live rows (delete-heavy churn), or
  *    the segment count exceeds `maxSegments` (insert-only churn: every
  *    add appends segments and serve cost is linear in their count —
  *    the Lucene merge-policy trigger). Both bounds amortize one
  *    rebuild over many cheap incremental writes.
  */
final class HnswStore(spark: SparkSession, path: String,
                      params: HnswIndex.Params = HnswIndex.Params(),
                      maxTombstoneFrac: Double = 0.2,
                      maxSegments: Int = 64) {
  import spark.implicits._
  import HnswStore.SegRow

  private val graphsPath = s"$path/graphs"
  private val tombPath = s"$path/tombstones"

  // ------------------------------------------------------------- lifecycle

  /** Bulk build at generation 0 (replaces any existing state). */
  def build(corpus: DataFrame, vecCol: String, idCol: String): Unit = {
    HnswIndex.build(corpus, vecCol, idCol, params)
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").parquet(graphsPath)
    Seq.empty[(Long, Long)].toDF("id", "gen")
      .write.mode("overwrite").parquet(tombPath)
  }

  /** Incremental add/replace: tombstone stale copies of incoming ids,
    * then append the batch as new segment(s) under the next generation.
    * The batch is its own graph — one segment per ~4k rows up to the
    * configured count, so a small delta builds one small graph and a
    * bulk backfill still parallelizes. */
  def add(df: DataFrame, vecCol: String, idCol: String): Unit = {
    if (!exists(graphsPath)) { build(df, vecCol, idCol); return }
    val g = maxGen
    // ids that already live in some segment: distributed semi-join over
    // the column-pruned ids arrays; the collect is bounded by BATCH size
    val stale = segRows.flatMap(r => r.ids.iterator).toDF("id")
      .join(df.select(col(idCol).cast("long").as("id")), "id")
      .distinct().as[Long].collect()
    if (stale.nonEmpty) appendTombstones(stale.toSeq, g)
    val batchN = df.count()
    val batchSegs = math.max(1L, math.min(params.numSegments.toLong,
      batchN / 4096 + 1)).toInt
    HnswIndex.build(df, vecCol, idCol, params.copy(numSegments = batchSegs))
      .withColumn("gen", lit(g + 1))
      .write.mode("append").parquet(graphsPath)
    maybeRebuild()
  }

  /** Point/bulk remove: tombstone at the current generation. */
  def remove(ids: Seq[Long]): Unit = {
    appendTombstones(ids, maxGen)
    maybeRebuild()
  }

  // ----------------------------------------------------------------- serve

  /** ANN top-k over live rows: per-segment beam over-fetches by that
    * segment's own dead count, the generation rule drops dead rows,
    * TakeOrderedAndProject merges segments×k short rows. */
  def search(probe: Array[Float], k: Int, ef: Int = 64): DataFrame = {
    val q = HnswGraph.normalized(probe)
    val bc = spark.sparkContext.broadcast(readTombstones())
    segRows.flatMap { row =>
      val dead = bc.value
      var deadInSeg = 0
      var i = 0
      while (i < row.ids.length) {
        if (dead.get(row.ids(i)).exists(_ >= row.gen)) deadInSeg += 1
        i += 1
      }
      val kFetch = k + deadInSeg
      HnswGraph(row.graph).search(q, kFetch, math.max(ef, kFetch)).iterator
        .filter { case (id, _) => dead.get(id).forall(_ < row.gen) }
        .take(k)
    }.toDF("vec_id", "sim")
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  // ------------------------------------------------------------ inspection

  /** Live (id, normalized vector) rows — latest generation per id,
    * tombstone rule applied. Also the rebuild extraction path. (Vectors
    * were L2-normalized at segment build; renormalizing on rebuild is
    * idempotent, and cosine results are unaffected.) */
  def liveVectors: DataFrame = {
    val bc = spark.sparkContext.broadcast(readTombstones())
    segRows.flatMap { row =>
      val dead = bc.value
      row.ids.iterator.zipWithIndex.collect {
        case (id, i) if dead.get(id).forall(_ < row.gen) =>
          (id, row.vecs.slice(i * row.dims, (i + 1) * row.dims), row.gen)
      }
    }.toDF("vec_id", "vec", "gen")
      // an id updated across generations: newest copy wins
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("gen").desc)))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("vec"))
  }

  def tombstoneCount: Long = readTombstones().size.toLong

  def segmentCount: Long = segRows.count()

  /** The persisted segment graphs as a batched-search input
    * ([[HnswIndex.searchMany]]/`searchManyWhere` decode it per task).
    * Raw segments — tombstones are NOT applied here; on a store with
    * live tombstones, filter results against [[liveVectors]] (or
    * search per-probe via [[search]], which applies them). */
  def graphs: DataFrame = segRows.toDF()

  // -------------------------------------------------------------- internal

  private def segRows = spark.read.parquet(graphsPath).as[SegRow]

  private def maxGen: Long =
    spark.read.parquet(graphsPath)
      .agg(coalesce(max(col("gen")), lit(0L))).head().getLong(0)

  private def maybeRebuild(): Unit = {
    val tombs = readTombstones()
    val tooManySegments = segmentCount > maxSegments
    if (tombs.isEmpty && !tooManySegments) return
    val tombTrip = tombs.nonEmpty && {
      val liveCnt = liveVectors.count()
      liveCnt > 0 && tombs.size.toDouble / liveCnt > maxTombstoneFrac
    }
    if (tombTrip || tooManySegments) {
      // Compact through a scratch parquet: build() overwrites the very
      // files liveVectors reads, so the snapshot must be durable first.
      val tmp = s"$path/compact_tmp"
      liveVectors.write.mode("overwrite").parquet(tmp)
      build(spark.read.parquet(tmp), "vec", "vec_id")
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  private def exists(dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def readTombstones(): Map[Long, Long] =
    if (!exists(tombPath)) Map.empty
    else spark.read.parquet(tombPath).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).max }

  private def appendTombstones(ids: Seq[Long], gen: Long): Unit =
    ids.map(id => (id, gen)).toDF("id", "gen")
      .write.mode("append").parquet(tombPath)
}

object HnswStore {
  /** One persisted segment row: a frozen [[HnswIndex.SegmentGraph]] plus
    * its generation stamp. Top-level so the encoder needs no outer
    * instance. */
  private[search] case class SegRow(
      gen: Long, segment: Int, dims: Int, entry: Int, max_level: Int,
      ids: Array[Long], vecs: Array[Float], levels: Array[Int],
      node_slot: Array[Int], nbr_off: Array[Int], nbrs: Array[Int]) {
    def graph: HnswIndex.SegmentGraph = HnswIndex.SegmentGraph(
      segment, dims, entry, max_level, ids, vecs, levels, node_slot, nbr_off, nbrs)
  }
}
