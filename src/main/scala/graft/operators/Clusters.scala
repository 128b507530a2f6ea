package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected-components cluster resolution for dedup pipelines.
  *
  * The dedup operators ([[Dedup]]) emit near-duplicate PAIRS; dropping
  * duplicates needs one canonical keeper per transitive CLUSTER (A~B,
  * B~C ⇒ {A,B,C} even when A and C were never compared). The reference
  * has no analog (its store dedups by `id` only, SharedLib upsert
  * semantics); this is the standard corpus-dedup step between pair
  * generation and keeper selection.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * published shuffle-native CC algorithm. Each round is two
  * groupBy-min/join passes over the edge list; convergence is
  * O(log² n) rounds (observed ≤ a handful on dedup graphs, whose
  * components are tiny and dense). No driver-side graph state: the
  * only `collect` is the per-round convergence checksum (2 longs).
  *
  * Scale notes: every round shuffles the current edge list on one key —
  * edges only shrink (toward star edges (node → root)), so cost is
  * bounded by the initial pair count, not n². `localCheckpoint`
  * truncates lineage each round so the plan does not deepen with
  * iteration count (on a cluster with a checkpoint dir configured,
  * `df.checkpoint()` is the durable alternative; local truncation is
  * the right default for an iterative refinement whose input is
  * recomputable).
  */
object Clusters {

  /** Star-contract one round. `largeStar` connects every neighbor
    * strictly larger than the center to the center's minimum; `smallStar`
    * (dir = edges oriented large→small) connects all smaller neighbors
    * and the center to the minimum. Both preserve connectivity and
    * monotonically pull components toward their minimum id. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val m = adj.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("mn"))
    adj.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("mn").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    // orient big→small so each group holds a center and its smaller nbrs
    val dir = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val m = dir.groupBy("u").agg(min(col("v")).as("mn"))
    val nbrEdges = dir.join(m, "u")
      .select(col("v").as("u"), col("mn").as("v"))
    val centerEdges = m.select(col("u"), col("mn").as("v"))
    nbrEdges.union(centerEdges)
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Resolve connected components of the undirected pair list `edges`
    * ((aCol, bCol), any orientation, duplicates fine). Returns one row
    * per node of `nodes`: (idCol, cluster_id) with cluster_id = the
    * minimum node id in the component; nodes in no pair are their own
    * singleton cluster.
    *
    * Size-adaptive: near-dup edge lists are usually a sliver of the
    * corpus (a few % near-dup rate), so when the deduped edge count is
    * ≤ `driverMaxEdges` (default 1M pairs ≈ 16 MB — unambiguously
    * driver-scale) the components are solved with an in-memory
    * union-find and broadcast back, skipping the star rounds' ~6
    * shuffle stages each. Larger graphs take the distributed star
    * loop. Both paths produce identical labels (spec-asserted). */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50,
                          driverMaxEdges: Long = 1L << 20): DataFrame = {
    // tracked checkpoints throughout: each round's stale edge list is
    // released via its handle — a bare Dataset.unpersist on a
    // localCheckpoint'd frame is a silent no-op (see [[Pinned]]), which
    // used to pin EVERY round's edge table until GC. Rounds go through
    // the shared seam: spark.graft.reliableCheckpointInterval routes
    // every N-th through scratch parquet (see [[IterCheckpoint]])
    val iter = new IterCheckpoint(nodes.sparkSession, "cc")
    var p = iter.materialize(
      edges.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    var e = p.df
    var prev = checksum(e)
    val labels =
      if (prev._1 <= driverMaxEdges) {
        val l = driverUnionFind(nodes.sparkSession, e)
        p.release() // labels are driver rows; the edge blocks are done
        l
      } else {
        var converged = false
        var round = 0
        while (!converged && round < maxRounds) {
          val np = iter.materialize(smallStar(largeStar(e)))
          val cur = checksum(np.df)
          converged = cur == prev
          prev = cur
          p.release()
          p = np; e = np.df
          round += 1
        }
        require(converged, s"connectedComponents did not converge in $maxRounds rounds")
        // converged edge list is a star forest: (node → root). Roots and
        // singletons map to themselves via the left join below. The
        // label map (cluster-members-sized, ≪ edge list) is pinned in
        // place of the final edge table so the returned plan survives
        // the release; the harness' per-query sweep (or GC) frees it.
        val lp = Pinned.checkpoint(
          e.select(greatest(col("u"), col("v")).as("id"),
              least(col("u"), col("v")).as("root"))
            .groupBy("id").agg(min(col("root")).as("root")))
        p.release()
        lp.df
      }
    nodes.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("root"), col(idCol).cast("long")).as("cluster_id"))
  }

  /** Small-graph path: collect the (already deduped, driver-scale) edge
    * list, solve with union-find (iterative find + path compression, so
    * long chains cannot overflow the stack), return (id, root) rows for
    * the nodes that appear in edges — singletons fall out of the caller's
    * left join. The result is broadcast-size by construction. */
  private def driverUnionFind(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      var y = x0 // path compression
      while (parent.getOrElse(y, y) != y) { val p = parent(y); parent(y) = x; y = p }
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
    ids.map(id => (id, find(id))).toSeq.toDF("id", "root")
  }

  /** Order-independent convergence fingerprint of an edge list: count
    * plus XOR of per-edge hashes (overflow-free, order-free; edges are
    * distinct so cancellation needs a 64-bit hash collision). Driver
    * sees 2 longs per round. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Convenience: one keeper (min id) per cluster joined back to pair
    * clusters — the "drop duplicates, keep canonical" corpus step. */
  def keepers(nodes: DataFrame, idCol: String,
              edges: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(nodes, idCol, edges, aCol, bCol)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))

  /** The full near-dedup pass a corpus pipeline actually runs: MinHash-
    * LSH candidate pairs → transitive cluster resolution → keep the
    * minimum-id document of every cluster, all other columns intact.
    * Semi-join against the keeper set, so the corpus rows shuffle once
    * on the id. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, numHashes: Int = 24, bands: Int = 8,
                         threshold: Double = 0.8): DataFrame = {
    val (pairs, cleanup) =
      Dedup.minhashLshPairsManaged(df, idCol, textCol, n, numHashes, bands, threshold)
    // id-only keepers rematerialized to scratch (not checkpointed): the
    // returned semi-join references files, nothing stays pinned
    val keep = graft.store.Scratch.rematerialize(
      keepers(df, idCol, pairs, "a_id", "b_id"), "neardup-keepers")
    cleanup()
    df.join(keep, Seq(idCol), "left_semi")
  }
}
