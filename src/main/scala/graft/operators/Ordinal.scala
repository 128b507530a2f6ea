package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordinal association over a bounded contingency grid — the
  * monotone-relationship readouts between two BANDED ordinal columns
  * (Goodman & Kruskal 1954; Somers 1962), complementing q257's
  * Kendall τ-b (which this family shares pair algebra with) by
  * answering the asymmetric question "how well does x PREDICT the
  * ordering of y" (Somers' d_yx) and the tie-free strength (gamma):
  *
  *   C = Σ n_ab·n_a'b' over a' > a, b' > b   (concordant pairs)
  *   D = Σ n_ab·n_a'b' over a' > a, b' < b   (discordant)
  *   γ = (C−D)/(C+D)
  *   d_yx = (C−D)/(P − Tx),  d_xy = (C−D)/(P − Ty)
  *
  * with P = N(N−1)/2 total pairs and Tx/Ty = pairs tied on x / on y
  * (inclusive of both-tied — the standard denominators).
  *
  * Exactness: ONE map-side-combined (x, y) census over the corpus is
  * the only corpus pass; the pair algebra runs DRIVER-SIDE on the
  * loudly-bounded grid in exact BigInt (pair counts reach N²/2 ≈ 10²⁴
  * at 10¹² rows — past int64, so they publish as correctly-rounded
  * doubles, the VARCHAR-route contract), ratios close in doubles from
  * those integers, 6 dp.
  *
  * Scale shape: census shuffle keyed (x, y); the O(cells²) concordance
  * loop runs on ≤ 2¹² cells (≤ 1.7·10⁷ driver ops) — a contingency
  * measure is coarse-banded by construction, and the bound refuses a
  * continuous column loudly (the Grids discipline). */
object Ordinal {

  def gammaSomers(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val census = df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__n"))
    val cells = Grids.collectBounded(census, "gammaSomers contingency grid",
      maxRows = 1 << 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(cells.length >= 2, s"gammaSomers: ${cells.length} cells")
    val n = cells.map(c => BigInt(c._3)).sum
    require(n >= 2, s"gammaSomers: $n rows")
    var cPairs = BigInt(0); var dPairs = BigInt(0)
    var i = 0
    while (i < cells.length) {
      val (xa, ya, na) = cells(i)
      var j = i + 1
      while (j < cells.length) {
        val (xb, yb, nb) = cells(j)
        val prod = BigInt(na) * nb
        val s = (xb - xa).sign * (yb - ya).sign
        if (s > 0) cPairs += prod
        else if (s < 0) dPairs += prod
        j += 1
      }
      i += 1
    }
    def tiedPairs(key: ((Long, Long, Long)) => Long): BigInt =
      cells.groupBy(key).values
        .map { g => val t = g.map(c => BigInt(c._3)).sum; t * (t - 1) / 2 }
        .sum
    val p = n * (n - 1) / 2
    val tx = tiedPairs(_._1)
    val ty = tiedPairs(_._2)
    require(cPairs + dPairs > 0,
      "gammaSomers: no untied pairs — both columns are constant or " +
        "perfectly tied")
    val cd = (cPairs - dPairs).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.range(1).select(
      lit(n.toLong).as("n"), lit(cells.length.toLong).as("cells"),
      lit(cPairs.toDouble).as("c_pairs"), lit(dPairs.toDouble).as("d_pairs"),
      lit(tx.toDouble).as("tied_x"), lit(ty.toDouble).as("tied_y"),
      lit(r6(cd / (cPairs + dPairs).toDouble)).as("gamma"),
      lit(r6(cd / (p - tx).toDouble)).as("somers_dyx"),
      lit(r6(cd / (p - ty).toDouble)).as("somers_dxy"))
  }
}
