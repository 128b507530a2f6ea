package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — Fleiss' kappa (Fleiss 1971) over
  * (item, rater, label) rows: chance-corrected agreement for a FIXED
  * number of raters per item, any number of categories. The label-
  * quality audit for human- or model-annotated training data (RLHF
  * preference labels, quality ratings, taxonomy tags): raw percent
  * agreement flatters skewed label distributions — kappa subtracts the
  * agreement a marginal-respecting random rater would get. q205's
  * label-noise audit asks "does a label disagree with its NEIGHBORS";
  * this asks "do the RATERS agree with each other" — upstream of any
  * embedding.
  *
  * All sufficient statistics are exact integers:
  *   S = Σ_i Σ_j n_ij²  (within-item agreement mass),
  *   T = Σ_j c_j²       (marginal mass, c_j = Σ_i n_ij),
  * with N items × n raters:
  *   P̄  = (S − N·n) / (N·n·(n−1)),
  *   P̄e = T / (N·n)²,
  *   κ  = (P̄ − P̄e) / (1 − P̄e)   — NULL when P̄e = 1 (degenerate:
  *        every rating in one category; agreement is undefined, not 1).
  * The closing κ is one fixed expression tree over BIGINTs — each IEEE
  * op correctly rounded, so the double replays bit-identically in any
  * engine.
  *
  * Contract (validated loudly, not assumed): every item has exactly the
  * same rater count and no (item, rater) duplicates — an incomplete
  * design needs a different estimator (Krippendorff) and silently
  * mis-normalizes here.
  *
  * Scale shape: one (item, label) map-side-combined count, one
  * item-level aggregate, category marginals from the cell table (the
  * q174 "derive totals from cells" discipline) — the rating table is
  * scanned once; everything downstream is metadata-cardinality. */
object Agreement {

  /** One row: (n_items, n_raters, n_categories, s_within, s_marginal,
    * kappa). */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String): DataFrame = {
    val perItem = df.groupBy(col(itemCol))
      .agg(count(lit(1)).as("__rows"), countDistinct(col(raterCol)).as("__raters"))
    val shapes = perItem
      .agg(min(col("__rows")).as("lo"), max(col("__rows")).as("hi"),
        min(col("__raters")).as("rlo"), max(col("__raters")).as("rhi")).head()
    require(shapes.getLong(0) == shapes.getLong(1) &&
        shapes.getLong(2) == shapes.getLong(3) &&
        shapes.getLong(0) == shapes.getLong(2),
      s"fleissKappa needs a complete design (same rater count per item, no " +
        s"duplicate (item, rater) rows): rows/item in [${shapes.getLong(0)}, " +
        s"${shapes.getLong(1)}], raters/item in [${shapes.getLong(2)}, ${shapes.getLong(3)}]")

    val cells = df.groupBy(col(itemCol).as("__i"), col(labelCol).as("__j"))
      .agg(count(lit(1)).as("__nij"))
    val marginals = cells.groupBy(col("__j")).agg(sum(col("__nij")).as("__cj"))
    val agg = cells.agg(
        sum(col("__nij") * col("__nij")).as("s_within"),
        countDistinct(col("__i")).as("n_items"))
      .crossJoin(broadcast(marginals.agg(
        sum(col("__cj") * col("__cj")).as("s_marginal"),
        count(lit(1)).as("n_categories"))))
    val n = lit(shapes.getLong(0))
    // κ from exact BIGINTs in one fixed expression tree; P̄e = 1 → NULL
    val nn = col("n_items") * n
    val pbar = (col("s_within") - nn).cast("double") /
      (nn * (n - 1)).cast("double")
    val pe = col("s_marginal").cast("double") / (nn * nn).cast("double")
    agg.select(col("n_items"), n.cast("long").as("n_raters"),
      col("n_categories"), col("s_within"), col("s_marginal"),
      when(col("s_marginal") === nn * nn, lit(null).cast("double"))
        .otherwise((pbar - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Krippendorff's α (nominal) over (item, rater, label) rows — the
    * INCOMPLETE-design estimator [[fleissKappa]]'s contract points at:
    * raters may skip items (the real shape of crowd/model annotation
    * queues), and units with fewer than 2 ratings drop out of the
    * coincidence mass instead of breaking a normalizer
    * (Krippendorff 2004, §11.3).
    *
    * Exact-rational form: the coincidence matrix's 1/(m_u − 1) pair
    * weights are cleared by `scale` = lcm over observed (m_u − 1)
    * values (bounded by the rater count — computed from the data, ≤ R
    * distinct values collected). With scaled integers
    *   n'_c = scale · Σ_u m_uc,  n' = Σ_c n'_c,
    *   D'   = Σ_u scale · (m_u² − Σ_c m_uc²) / (m_u − 1)
    * (each unit's term exact — (m_u − 1) divides scale), nominal α
    * closes as
    *   α = 1 − (n' − scale) · D' / (n'² − Σ_c n'_c²)
    * — all BIGINT until the one closing double division, so the
    * statistic is partitioning-invariant and replays cross-engine.
    *
    * Scale shape: one (item, label) map-side-combined count, one
    * item-level aggregate; category marginals from the cell table (the
    * q174 discipline). The lcm collect is ≤ distinct-m-sized. */
  def krippendorffAlpha(df: DataFrame, itemCol: String, raterCol: String,
                        labelCol: String): DataFrame = {
    val cells = df.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__j"))
      .agg(count(lit(1)).as("__nij"))
    val units = cells.groupBy(col("__i"))
      .agg(sum(col("__nij")).as("__m"),
        sum(col("__nij") * col("__nij")).as("__sq"))
      .filter(col("__m") >= 2)
    val ms = units.select(col("__m")).distinct()
      .collect().map(_.getLong(0)).sorted // bounded: ≤ rater-count values
    require(ms.nonEmpty, "krippendorffAlpha: no unit has >= 2 ratings")
    val scale = ms.map(_ - 1).foldLeft(1L)((a, b) =>
      a / java.math.BigInteger.valueOf(a).gcd(
        java.math.BigInteger.valueOf(b)).longValueExact() * b)
    // scale div (m−1) is exact by lcm construction; try_divide-then-cast
    // would detour through DOUBLE, so keep it integral (Spark `/` on
    // longs returns double — the sum must stay a BIGINT fold)
    val dNum = units.agg(sum(
      expr(s"$scale div (__m - 1)") * (col("__m") * col("__m") - col("__sq")))
      .as("d_num"))
    val nc = cells.join(units.select(col("__i")), "__i")
      .groupBy(col("__j"))
      .agg((sum(col("__nij")) * scale).as("__nc"))
    val marg = nc.agg(sum(col("__nc")).as("n_scaled"),
      sum(col("__nc") * col("__nc")).as("s_nc2"),
      count(lit(1)).as("n_categories"))
    val nUnits = units.agg(count(lit(1)).as("n_units"))
    nUnits.crossJoin(broadcast(marg)).crossJoin(broadcast(dNum))
      .select(col("n_units"), col("n_categories"),
        expr(s"n_scaled div $scale").as("n_ratings"),
        lit(scale).as("scale"), col("d_num"),
        when(col("n_scaled") * col("n_scaled") === col("s_nc2"),
          lit(null).cast("double")) // one category: disagreement undefined
          .otherwise(lit(1.0) -
            ((col("n_scaled") - scale) * col("d_num")).cast("double") /
              (col("n_scaled") * col("n_scaled") - col("s_nc2")).cast("double"))
          .as("alpha"))
  }
}
