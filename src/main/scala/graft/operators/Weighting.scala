package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kish effective sample size under weighting — what a weighted
  * corpus or weighted experiment is REALLY worth: reweighting
  * (importance weights, domain-mix up/down-weights, inverse-propensity
  * weights) inflates variance, and ESS = (Σw)²/Σw² is the equivalent
  * unweighted sample size (Kish 1965 §8.2; the design-effect
  * denominator). A source with 1M documents but ESS 10k is being
  * carried by a handful of heavy weights — the q101/q106 mixture
  * layer's hidden-risk scalar, and the standard sanity gate before
  * trusting any IPW estimate (q259).
  *
  * Exactness: w is integer-scaled (basis points, token counts); Σw
  * and Σw² are exact DECIMAL(38,0) sums, the ESS/deff closes are
  * single double expressions, 6-dp.
  *
  * Scale shape: ONE map-side-combined aggregate onto the groups grid;
  * no windows, no driver work. */
object Weighting {

  /** (group, n, sum_w, ess, ess_ratio, deff) per group — ess_ratio =
    * ESS/n ∈ (0,1], deff = n·Σw²/(Σw)² ≥ 1. */
  def kishEss(df: DataFrame, groupCol: String,
              weightCol: String): DataFrame = {
    val w = col(weightCol).cast("decimal(38,0)")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(w).cast("decimal(38,0)").as("__sw"),
        sum(w * w).cast("decimal(38,0)").as("__sww"))
      .select(col(groupCol), col("n"),
        col("__sw").cast("double").as("sum_w"),
        round(col("__sw").cast("double") * col("__sw").cast("double") /
          col("__sww").cast("double"), 6).as("ess"),
        round(col("__sw").cast("double") * col("__sw").cast("double") /
          (col("__sww").cast("double") * col("n").cast("double")), 6)
          .as("ess_ratio"),
        round(col("n").cast("double") * col("__sww").cast("double") /
          (col("__sw").cast("double") * col("__sw").cast("double")), 6)
          .as("deff"))
      .orderBy(col(groupCol))
  }

  /** Raking / iterative proportional fitting (Deming & Stephan 1940)
    * — the TWO-margin reweighting the q97 single-key quota mix cannot
    * express: find per-cell multipliers so the weighted corpus hits a
    * target LANG distribution AND a target SOURCE distribution
    * simultaneously (both margins uniform here is the classic
    * "balance the release on both axes" move; any target margins
    * expressible as n·share work the same).
    *
    * Factorization invariant: IPF weights stay w_ij = n_ij·r_i·c_j, so
    * the iteration only updates the two margin-sized factor vectors:
    *
    *   r_i ← R_i / Σ_j n_ij·c_j,   c_j ← C_j / Σ_i n_ij·r_i
    *
    * Determinism contract: the factor updates are double divisions of
    * ORDERED folds (row folds in column order, column folds in row
    * order — the q279 discipline, replayed by the oracle's
    * `list_reduce(list(... ORDER BY ...))`), run a FIXED `iterations`
    * count driver-side on the loudly-bounded census grid; rounding
    * once at output (6 dp). Output: one row per cell (rowKey, colKey,
    * n, multiplier, weighted) plus the per-row post-fit mass deviation
    * audit (max |Σ_j w − R_i| over rows, repeated).
    *
    * Scale shape: ONE map-side-combined (row, col) census is the only
    * corpus pass; the factor iteration is O(iterations·cells) on the
    * driver, cells ≤ 2¹² by contract. */
  def raking(df: DataFrame, rowCol: String, colCol: String,
             iterations: Int = 6): DataFrame = {
    require(iterations >= 1 && iterations <= 32,
      s"raking: iterations=$iterations outside [1, 32]")
    val spark = df.sparkSession
    val census = df
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).cast("string").as("__r"),
        col(colCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val cells = Grids.collectBounded(census, "raking contingency grid",
      maxRows = 1 << 12)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    require(cells.length >= 2, s"raking: ${cells.length} cells")
    val rows = cells.map(_._1).distinct.sorted
    val colsK = cells.map(_._2).distinct.sorted
    val n = cells.map(_._3).sum
    // uniform target margins: R_i = N/|rows|, C_j = N/|cols|
    val tr = n.toDouble / rows.length.toDouble
    val tc = n.toDouble / colsK.length.toDouble
    val rIdx = rows.zipWithIndex.toMap
    val cIdx = colsK.zipWithIndex.toMap
    val r = Array.fill(rows.length)(1.0)
    val c = Array.fill(colsK.length)(1.0)
    // cells are (row, col)-sorted, so iterating them in order IS the
    // ordered fold both margins need
    var it = 0
    while (it < iterations) {
      val rs = Array.fill(rows.length)(0.0)
      cells.foreach { case (ri, cj, nij) =>
        rs(rIdx(ri)) += nij.toDouble * c(cIdx(cj)) }
      var i = 0
      while (i < rows.length) { r(i) = tr / rs(i); i += 1 }
      val cs = Array.fill(colsK.length)(0.0)
      cells.foreach { case (ri, cj, nij) =>
        cs(cIdx(cj)) += nij.toDouble * r(rIdx(ri)) }
      var j = 0
      while (j < colsK.length) { c(j) = tc / cs(j); j += 1 }
      it += 1
    }
    // post-fit row-mass audit: after a column step rows drift — report
    // the worst absolute row deviation (folded in the same cell order)
    val rowMass = Array.fill(rows.length)(0.0)
    cells.foreach { case (ri, cj, nij) =>
      // n·(r·c) — the same association the multiplier/weighted columns
      // and the oracle's fold use (IEEE multiply is not associative)
      rowMass(rIdx(ri)) += nij.toDouble * (r(rIdx(ri)) * c(cIdx(cj))) }
    val maxDev = rows.indices.map(i => math.abs(rowMass(i) - tr))
      .foldLeft(0.0)(math.max)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField,
      StringType, LongType, DoubleType}
    val out = cells.map { case (ri, cj, nij) =>
      val m = r(rIdx(ri)) * c(cIdx(cj))
      org.apache.spark.sql.Row(ri, cj, nij, m, nij.toDouble * m, maxDev)
    }
    spark.createDataFrame(out.toSeq.asJava, StructType(Seq(
      StructField(rowCol, StringType), StructField(colCol, StringType),
      StructField("n", LongType), StructField("multiplier", DoubleType),
      StructField("weighted", DoubleType),
      StructField("max_row_dev", DoubleType))))
      .select(col(rowCol), col(colCol), col("n"),
        round(col("multiplier"), 6).as("multiplier"),
        round(col("weighted"), 6).as("weighted"),
        round(col("max_row_dev"), 6).as("max_row_dev"))
      .orderBy(col(rowCol), col(colCol))
  }
}
