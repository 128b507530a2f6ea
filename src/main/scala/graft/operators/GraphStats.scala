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
}
