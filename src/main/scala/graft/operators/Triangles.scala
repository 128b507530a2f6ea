package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via degree-ordered edge orientation
  * (Suri & Vassilvitskii, WWW 2011 — the MapReduce formulation; the
  * sequential root is Chiba–Nishizeki). Triangle participation is the
  * workhorse local-clustering signal of graph-shaped corpora: spam/link
  * farms and template boilerplate show up as abnormal triangle density
  * long before global centrality (q155) moves.
  *
  * Why orientation is THE scale lever: the naive wedge join explodes at
  * every high-degree hub (Σ d(v)² — a single 1M-degree node contributes
  * 10¹² wedges). Orienting each undirected edge from its lower-ordered
  * endpoint to its higher-ordered one under the total order
  * (degree, id) caps every node's OUT-degree at O(√m) — the
  * arrow-boundedness fact from the paper — so Σ outdeg(v)² is bounded
  * by m^1.5 REGARDLESS of the degree distribution, and each triangle
  * materializes exactly once (at its lowest-ordered vertex) instead of
  * six times.
  *
  * The dataflow is three shuffles, all on node/edge keys:
  *   1. canonicalize + dedup the undirected edge set (self-loops drop);
  *   2. one degree count + two joins to attach each endpoint's order
  *      key `ord = degree·2³² + id` (exact in BIGINT for any id < 2³²,
  *      checked loudly);
  *   3. the wedge self-join on the oriented source + one equi-join of
  *      wedge endpoints against the oriented edge set.
  * Every count is an exact integer; the result is partitioning-
  * invariant and replays in ANY engine as the canonical a<b<c triple
  * join (orientation is pure optimization, not semantics — the spec
  * proves equality).
  *
  * The hub cap: even with the m^1.5 bound, a dense co-occurrence graph
  * can sit at ~10¹⁰ wedges (the sf1 smoke's spill onset), and the
  * standard mining cut is dropping the few pathological hubs — the same
  * hot-key lever as the dedup family's `maxDf`. [[autoCap]] derives the
  * cap FROM the degree distribution (the q-quantile degree, default
  * q=99.9%), so on benign distributions it drops NOTHING (cap = max
  * degree ⇒ bit-exact full count) and on heavy-tailed ones it cuts
  * exactly the tail, with a [[CapReport]] accounting every dropped
  * node/edge and the wedge bound removed — loud, never silent.
  */
object Triangles {

  /** Accounting for a (derived or explicit) hub cap: what the cap
    * removed, so callers can surface the cut instead of silently
    * under-counting. `wedgeBoundDropped` = Σ d(v)·(d(v)−1)/2 over the
    * dropped nodes — the center-wedge space the cut avoided (the cost
    * driver the cap exists for). */
  final case class CapReport(cap: Long, nodesTotal: Long, nodesDropped: Long,
                             edgesDropped: Long, wedgeBoundDropped: Long)

  /** Canonical undirected edge set: (a < b), deduped, self-loops gone. */
  private def canonical(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()

  private def degreesOf(e0: DataFrame): DataFrame =
    e0.select(col("a").as("n")).union(e0.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

  /** Data-derived default hub cap: the `quantile` point of the node
    * degree distribution (one aggregate over the node table — tiny next
    * to the wedge join it protects), plus the full accounting of what
    * that cap would drop. On a benign distribution the q99.9 degree IS
    * the max degree, so the report shows zero drops and capped runs are
    * bit-exact; only a genuinely heavy tail gets cut, and the report
    * says exactly how much. (The same derive-the-knob-from-data move as
    * `Dedup.autoClusters`.) */
  def autoCap(edges: DataFrame, aCol: String, bCol: String,
              quantile: Double = 0.999): CapReport = {
    require(quantile > 0.0 && quantile <= 1.0, "quantile must be in (0, 1]")
    val e0 = canonical(edges, aCol, bCol).persist()
    try {
      val deg = degreesOf(e0).persist()
      try {
        // ceil of the interpolated quantile: a node sitting ON the
        // boundary survives (cap is inclusive), so quantile=1.0 keeps all
        val capRow = deg.agg(
          ceil(expr(s"percentile(d, $quantile)")).cast("long").as("cap"),
          count(lit(1)).as("n")).head()
        // empty canonical edge set (empty input or self-loops only):
        // percentile over zero rows is NULL — a zero-drop report, not an NPE
        if (capRow.isNullAt(0)) return CapReport(0L, 0L, 0L, 0L, 0L)
        val cap = capRow.getLong(0)
        val dropped = deg.filter(col("d") > cap)
          .agg(count(lit(1)).as("nd"),
            coalesce(sum(expr("(d * (d - 1)) div 2")), lit(0L)).as("wb"))
          .head()
        val edgesDropped = e0
          .join(deg.filter(col("d") > cap).select(col("n")).distinct(),
            col("a") === col("n") || col("b") === col("n"), "left_semi")
          .count()
        CapReport(cap, capRow.getLong(1), dropped.getLong(0), edgesDropped,
          dropped.getLong(1))
      } finally deg.unpersist(blocking = false)
    } finally e0.unpersist(blocking = false)
  }

  /** The oriented edge list (src, dst, dord): each canonical undirected
    * edge directed from lower to higher (degree, id). `maxDegree` drops
    * nodes above the cap BEFORE orientation. */
  private def oriented(edges: DataFrame, aCol: String, bCol: String,
                       maxDegree: Option[Long]): DataFrame = {
    // the 32-bit id guard lives IN the plan (codegen raise_error — zero
    // extra pass, fails loudly on the first offending row instead of
    // silently wrapping into a wrong orientation)
    val guard = (c: org.apache.spark.sql.Column) =>
      when(c >= lit(4294967296L), raise_error(concat(
        lit("Triangles: node id exceeds 32 bits: "), c.cast("string"))))
        .otherwise(c)
    val e0 = edges
      .select(guard(least(col(aCol), col(bCol)).cast("long")).as("a"),
        guard(greatest(col(aCol), col(bCol)).cast("long")).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val deg0 = degreesOf(e0)
    // hub cap: drop over-degree nodes (and their edges) BEFORE
    // orientation — degrees are NOT recomputed on the capped subgraph,
    // so the semantics is "triangles among nodes whose ORIGINAL degree
    // is ≤ cap": one pass, replayable, and stable under the cap (a
    // recompute-until-fixpoint variant is k-core, q190's operator)
    val deg = maxDegree match {
      case None => deg0
      case Some(cap) => deg0.filter(col("d") <= cap)
    }
    // ord packs (degree, id) into one BIGINT: d·2³² + id — exact while
    // ids fit 32 bits (degree ≤ n−1 < 2³¹ always); violations must fail
    // loudly, not wrap into a wrong orientation
    val ordOf = (d: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =>
      d * lit(4294967296L) + n
    val withOrd = e0
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(col("a"), col("b"),
        ordOf(col("da"), col("a")).as("oa"), ordOf(col("db"), col("b")).as("ob"))
    withOrd.select(
      when(col("oa") < col("ob"), col("a")).otherwise(col("b")).as("src"),
      when(col("oa") < col("ob"), col("b")).otherwise(col("a")).as("dst"),
      greatest(col("oa"), col("ob")).as("dord"))
  }

  /** All triangles, one row each: (x, y, z) = the triangle's vertices
    * with x the lowest-ordered (the counting vertex). Input edges are
    * treated as undirected; duplicates, reversals, and self-loops are
    * legal and collapse.
    *
    * `maxDegree` is the hub-cap lever the sf1 smoke motivated
    * (PLANS.md: a dense co-purchase graph's wedge space is Σ outdeg²,
    * and giant baskets mint cliques): nodes whose degree exceeds the
    * cap are dropped with their edges before orientation, so the count
    * is EXACT over the capped subgraph — the standard hot-key cut of
    * co-occurrence mining (the same role maxDf plays for terms).
    * Default None = the full exact count; [[autoCap]] derives the cap
    * from the data with drop accounting. */
  def triangles(edges: DataFrame, aCol: String, bCol: String,
                maxDegree: Option[Long] = None): DataFrame = {
    // the canonical edge set appears three times below (degree count,
    // order-key joins, wedge + closing joins) — its dedup Exchange is
    // computed once and reused (ReuseExchange, the q41 fact)
    val or = oriented(edges, aCol, bCol, maxDegree)
    val x = or.select(col("src"), col("dst").as("v"), col("dord").as("ov"))
    val y = or.select(col("src"), col("dst").as("w"), col("dord").as("ow"))
    val closing = or.select(col("src").as("v"), col("dst").as("w"))
    x.join(y, "src")
      .filter(col("ov") < col("ow")) // each wedge once, oriented
      .join(closing, Seq("v", "w"), "left_semi")
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
  }

  /** Per-node triangle participation: (node, n_tri). Nodes in no
    * triangle are absent (join against the node set to densify). */
  def perNode(edges: DataFrame, aCol: String, bCol: String,
              maxDegree: Option[Long] = None): DataFrame = {
    val tri = triangles(edges, aCol, bCol, maxDegree)
    tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** [[perNode]] with the data-derived default cap ENGAGED: derives the
    * q-quantile cap, counts on the capped subgraph, and returns the
    * accounting beside the result so the caller surfaces the cut (the
    * sf1 lesson: the lever must default on, with loud accounting — not
    * just exist). Benign degree distribution ⇒ zero drops ⇒ identical
    * to the exact [[perNode]]. */
  def perNodeAutoCapped(edges: DataFrame, aCol: String, bCol: String,
                        quantile: Double = 0.999): (DataFrame, CapReport) = {
    val report = autoCap(edges, aCol, bCol, quantile)
    (perNode(edges, aCol, bCol, Some(report.cap)), report)
  }

  /** Local clustering coefficient (Watts–Strogatz 1998): per node with
    * degree ≥ 2, coefficient = 2·triangles / (d·(d−1)) — how close the
    * node's neighborhood is to a clique. The numerator and denominator
    * are EXACT integers (emitted alongside the one closing IEEE
    * division), so the result replays hash-identically in any engine.
    * Link farms sit near 1.0 (everything mutually linked); hub pages
    * whose neighbors ignore each other sit near 0 — a per-document
    * signal where q188's raw count only flags volume. Zero-triangle
    * nodes are kept (coefficient 0), so the distribution is honest.
    *
    * Under a cap the WHOLE computation lives on the capped subgraph:
    * over-degree nodes and their edges are removed first, and both the
    * triangle count AND the degree denominator come from what remains —
    * mixed semantics (capped numerator over full-graph degree) would
    * silently deflate coefficients for hub neighbors. Without a cap
    * this reduces to the plain full-graph coefficient.
    *
    * Cost: the q188 triangle pass + the degree aggregate it already
    * computes, one extra join. */
  def clusteringCoefficient(edges: DataFrame, aCol: String, bCol: String,
                            maxDegree: Option[Long] = None): DataFrame = {
    val e0 = canonical(edges, aCol, bCol)
    // capped subgraph = drop over-ORIGINAL-degree nodes with their edges
    // (the same one-pass cut triangles() applies), then degrees are
    // recomputed on what remains so numerator and denominator agree
    val eCap = maxDegree match {
      case None => e0
      case Some(cap) =>
        val keep = degreesOf(e0).filter(col("d") <= cap).select(col("n"))
        e0.join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
    }
    val deg = degreesOf(eCap).withColumnRenamed("n", "node")
      .withColumnRenamed("d", "deg")
    deg.filter(col("deg") >= 2)
      .join(perNode(eCap, "a", "b"), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        (coalesce(col("n_tri"), lit(0L)).cast("double") * 2.0 /
          (col("deg") * (col("deg") - 1)).cast("double")).as("coef"))
  }
}
