package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Join-based PageRank in exact scaled-integer arithmetic.
  *
  * Link-graph centrality is the classic corpus-quality prior of a training
  * pipeline (Page, Brin, Motwani, Winograd, "The PageRank Citation
  * Ranking", 1999): documents/entities that the graph keeps pointing at
  * are up-weighted in curation and sampling. The engine expresses it the
  * Spark-native way — no graph library, just the two relational shuffles
  * per iteration everything else in this engine already uses:
  *
  *   1. `edges ⋈ ranks` on the source key (edges pre-partitioned by src,
  *      so every iteration reuses one stable shuffle layout), emitting
  *      per-edge contributions `rank div outdeg`;
  *   2. a map-side-combined `groupBy(dst).sum` back onto the node table.
  *
  * Ranks are BIGINT micro-units (`scale` = 1e12 ≙ total mass 1.0), all
  * updates are integer multiply/divide on positives — so the fixpoint
  * trajectory is bit-reproducible on any partitioning, any engine
  * (truncating and flooring division agree on positives), and a SQL
  * oracle replays it exactly. Sum order never matters: integer addition
  * is associative-commutative with no rounding.
  *
  * Per-node update (damping d = dampNum/dampDen):
  *   r₀(v)    = scale div N
  *   rᵢ₊₁(v) = (dampDen−dampNum)·scale div (dampDen·N)
  *             + dampNum · Σ_{u→v} (rᵢ(u) div outdeg(u)) div dampDen
  *
  * Dangling nodes (no out-edges) leak their damped mass — the standard
  * simplification; callers wanting strict mass conservation add reverse
  * edges or a sink node (the q155 gate builds a bidirectional bipartite
  * graph, which has no dangling nodes by construction).
  *
  * 100 TB shape: per iteration cost is one co-partitioned join + one
  * bounded aggregate; lineage is cut by materializing each iteration
  * (persist + count, previous iteration unpersisted), so K iterations
  * never replay the chain and the plan depth stays constant.
  */
object PageRank {

  /** Run `iterations` PageRank steps over a directed edge list.
    * Returns (node BIGINT, pr BIGINT) with Σ pr ≤ scale (exact integer
    * truncation loss only). Self-loops and duplicate edges are legal;
    * duplicates are collapsed. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, dampNum: Long = 85L, dampDen: Long = 100L,
          scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    val spark = edges.sparkSession

    // Out-degree is a per-SOURCE property: fold it into the edge table
    // ONCE (a window over the source key costs one shuffle at build),
    // so each iteration joins a single (src, dst, outdeg) relation —
    // not edges ⋈ ranks ⋈ outdeg.
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = (dampDen - dampNum) * scale / (dampDen * n) // positives: truncation == floor

    // The rank table is one row per NODE — orders of magnitude smaller
    // than the edge table on any natural graph. Up to ~50M nodes
    // (~16 B/row) broadcasting it turns every iteration into a NARROW
    // map over the cached edges plus ONE aggregate shuffle; beyond
    // that, fall back to a hash join on src and let AQE pick the
    // strategy. The iteration count is small and fixed, so lineage is
    // cut by materializing each rank table before dropping the last.
    val broadcastRanks = n <= 50000000L

    var ranks = nodes.withColumn("pr", lit(scale / n))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()

    (1 to iterations).foreach { _ =>
      val r = ranks.withColumnRenamed("node", "src")
      val contribs = e
        .join(if (broadcastRanks) broadcast(r) else r, "src")
        .selectExpr("dst", "pr div outdeg AS c")
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      val next = nodes
        .join(if (broadcastRanks) broadcast(contribs) else contribs,
          nodes("node") === contribs("dst"), "left")
        .selectExpr("node",
          s"$base + ($dampNum * coalesce(sc, CAST(0 AS BIGINT))) div $dampDen AS pr")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the previous iteration
      ranks.unpersist(blocking = false)
      ranks = next
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** The matching DuckDB oracle: unrolled iteration CTEs replaying the
    * identical integer arithmetic (`//` floors, `div` truncates — equal
    * on the positives this recursion stays in). `edgesCte` must define
    * a relation `e(src, dst)` already deduplicated. */
  def oracleCtes(edgesCte: String, iterations: Int,
                 dampNum: Long = 85L, dampDen: Long = 100L,
                 scale: Long = 1000000000000L): String = {
    val header =
      s"""e AS ($edgesCte),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         |meta AS (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST($scale // n AS BIGINT) AS pr FROM nodes CROSS JOIN meta)""".stripMargin
    val steps = (1 to iterations).map { i =>
      // CAST: DuckDB SUM(BIGINT) widens to HUGEINT, which pandas/the
      // driver compare read as float — pin every step back to BIGINT
      s"""r$i AS (
         |  SELECT v.node,
         |    CAST((${dampDen - dampNum} * $scale) // ($dampDen * meta.n)
         |      + ($dampNum * COALESCE(SUM(r${i - 1}.pr // deg.outdeg), 0)) // $dampDen AS BIGINT) AS pr
         |  FROM nodes v CROSS JOIN meta
         |  LEFT JOIN e ON e.dst = v.node
         |  LEFT JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  LEFT JOIN deg ON deg.src = e.src
         |  GROUP BY v.node, meta.n)""".stripMargin
    }
    (header +: steps).mkString(",\n")
  }
}
