package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph structural statistics — the audit scalars that summarize
  * a link graph's health in one row (beside the per-node family:
  * PageRank, k-core, triangles, clustering coefficient).
  *
  * [[degreeAssortativity]] — Newman's degree assortativity (Newman,
  * "Assortative mixing in networks", PRL 2002): the Pearson correlation
  * of endpoint degrees over edges. Social-ish graphs mix assortatively
  * (r > 0: hubs link hubs), web/biological graphs disassortatively
  * (r < 0: hubs link leaves) — and a LINK FARM bends r sharply positive
  * among its members, so the scalar is a cheap spam tripwire next to
  * the per-node q188/q197 signals.
  *
  * Exactness: every sufficient statistic is an exact BIGINT over the
  * DIRECTED edge list (each canonical edge counted both ways, so the
  * x/y marginals are symmetric and the formula collapses to
  * r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) with M = 2m) — one closing
  * double expression, engine-identical. NULL when the variance is zero
  * (regular graphs: r undefined, not 0). Overflow bound: Σxy ≤
  * M·d_max², fine through 2⁶³ for any graph whose degree table fits an
  * engine (document-scale graphs: d_max ≤ 10⁶, M ≤ 10¹² ⇒ ≤ 10²⁴ would
  * overflow — pre-cap degrees via the q188 autoCap lever first at that
  * extreme).
  *
  * Scale shape: canonical dedup (one shuffle), one degree aggregate,
  * two degree joins onto the edge list, one map-side-combined global
  * sum — no corpus-scale window, no collect. */
object GraphStats {

  /** One row: (m_edges, sum_x, sum_xx, sum_xy, assortativity). */
  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e0.select(col("a").as("n")).unionAll(e0.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val directed = e0.select(col("a").as("s"), col("b").as("t"))
      .unionAll(e0.select(col("b").as("s"), col("a").as("t")))
    val xy = directed
      .join(deg.withColumnRenamed("n", "s").withColumnRenamed("d", "x"), "s")
      .join(deg.withColumnRenamed("n", "t").withColumnRenamed("d", "y"), "t")
    xy.agg(
        (count(lit(1)) / 2).cast("long").as("m_edges"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"),
        count(lit(1)).as("__m2"))
      .select(col("m_edges"), col("sum_x"), col("sum_xx"), col("sum_xy"),
        when(col("__m2") * col("sum_xx") === col("sum_x") * col("sum_x"),
          lit(null).cast("double"))
          .otherwise(
            (col("__m2") * col("sum_xy") - col("sum_x") * col("sum_x")).cast("double") /
              (col("__m2") * col("sum_xx") - col("sum_x") * col("sum_x")).cast("double"))
          .as("assortativity"))
  }

  /** Rich-club coefficient curve (Zhou & Mondragón 2004; Colizza et
    * al. 2006 frame the normalization) — do the HUBS of this graph
    * preferentially connect to each other? φ(k) is the edge density
    * of the subgraph induced by nodes of degree > k:
    *
    *   φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1))
    *
    * Rising φ(k) = a rich club (hub oligarchy — one bad crawl seed
    * dominating a co-occurrence graph); flat/falling = hubs spread
    * out. The whole curve comes from TWO bounded histograms — node
    * counts by degree and edge counts by min(endpoint degrees) — so
    * every k on the grid is a conditional sum, not a subgraph pass.
    *
    * Exactness: degree and min-degree censuses are exact BIGINTs;
    * φ closes in one double per k. Undirected simple graph (edges
    * deduped canonically, self-loops dropped). φ is NULL where the
    * club has < 2 members.
    *
    * Scale shape: one distinct-edge shuffle, one degree census, one
    * keyed join of edges to degrees (twice, same key family), then
    * two histograms; the k grid (≤ 256) evaluates against histogram
    * rows — adding a k costs nothing. */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
               maxK: Int): DataFrame = {
    require(maxK >= 1 && maxK <= 256, s"richClub: maxK=$maxK")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val degHist = deg.groupBy(col("d")).agg(count(lit(1)).as("cn"))
    val minHist = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(least(col("da"), col("db")).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("ce"))
    val spark = edges.sparkSession
    import spark.implicits._
    val ks = (1 to maxK).map(_.toLong).toDF("k")
    val nodesK = ks.crossJoin(degHist)
      .groupBy(col("k"))
      .agg(sum(when(col("d") > col("k"), col("cn")).otherwise(0L))
        .as("n_nodes"))
    val edgesK = ks.crossJoin(minHist)
      .groupBy(col("k"))
      .agg(sum(when(col("m") > col("k"), col("ce")).otherwise(0L))
        .as("n_edges"))
    nodesK.join(edgesK, "k")
      .select(col("k"), col("n_nodes"), col("n_edges"),
        when(col("n_nodes") < 2, lit(null).cast("double"))
          .otherwise(round(lit(2.0) * col("n_edges").cast("double") /
            (col("n_nodes").cast("double") *
              (col("n_nodes") - 1).cast("double")), 6)).as("phi"))
      .orderBy(col("k"))
  }

  /** Newman–Girvan modularity of a GIVEN node partition (Newman 2004):
    * Q = Σ_c [e_c/m − (d_c/2m)²] — the "is this community structure
    * real" scalar for ANY labeling (a q191 label-propagation result,
    * a metadata column, a clustering): Q ≈ 0 means the partition holds
    * no more edges than a degree-preserving random rewiring would give
    * it; the suite's agreement metrics (q357) compare two partitions,
    * this scores one against the graph itself.
    *
    * Exactness: m, per-community internal-edge counts e_c and degree
    * masses d_c are exact BIGINTs; per-community terms evaluate once
    * in doubles and accumulate as DECIMAL(38,12) (order-independent).
    * Every node in the edge set must carry a label — silently dropping
    * unlabeled nodes would shrink d_c and inflate Q, so it refuses.
    *
    * Scale shape: one distinct-edge shuffle, one degree aggregate, two
    * node-keyed label joins; communities are metadata-bounded cells.
    * Output: one row (nodes, edges, communities, modularity). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, nodeCol: String,
                 communityCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
    val lab = labels
      .select(col(nodeCol).cast("long").as("n"),
        col(communityCol).cast("string").as("c"))
      .filter(col("n").isNotNull && col("c").isNotNull)
      .distinct()
    val spark = edges.sparkSession
    Pinned.withCheckpoint(e) { ed =>
      val m = ed.count()
      require(m >= 1, "modularity: empty edge set")
      val withLab = ed
        .join(lab.select(col("n").as("a"), col("c").as("ca")), Seq("a"),
          "left")
        .join(lab.select(col("n").as("b"), col("c").as("cb")), Seq("b"),
          "left")
      val unlabeled = withLab
        .filter(col("ca").isNull || col("cb").isNull).count()
      require(unlabeled == 0,
        s"modularity: $unlabeled edge endpoint(s) without a community " +
          "label — label every node in the edge set (or filter the " +
          "edges first, loudly)")
      // d_c: degree mass per community, off the endpoint multiset
      val dc = withLab.select(col("ca").as("c"))
        .unionAll(withLab.select(col("cb").as("c")))
        .groupBy(col("c")).agg(count(lit(1)).as("__dc"))
      // e_c: internal edges per community
      val ec = withLab.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("__ec"))
      val nodes = lab.join(ed.select(col("a").as("n"))
        .unionAll(ed.select(col("b").as("n"))).distinct(), "n")
      val nNodes = nodes.count()
      val cells = dc.join(ec, Seq("c"), "left")
        .withColumn("__e", coalesce(col("__ec"), lit(0L)))
      val term = col("__e").cast("double") / lit(m.toDouble) -
        (col("__dc").cast("double") / lit(2.0 * m)) *
          (col("__dc").cast("double") / lit(2.0 * m))
      val r = cells.agg(count(lit(1)).as("k"),
        sum(term.cast("decimal(38,12)")).as("__q")).head()
      spark.range(1).select(lit(nNodes).as("nodes"), lit(m).as("edges"),
        lit(r.getLong(0)).as("communities"),
        round(lit(BigDecimal(r.getDecimal(1)).toDouble), 6)
          .as("modularity"))
    }
  }
}
