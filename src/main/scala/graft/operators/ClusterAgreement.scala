package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering / labeling agreement — the eval the clustering family
  * (q94 semantic dedup, q191 label propagation, q109 representatives)
  * produces clusters WITHOUT: do two partitions of the same corpus
  * agree, chance-corrected? Adjusted Rand Index (Hubert & Arabie
  * 1985) reads pair-level agreement; normalized mutual information
  * (arithmetic normalization) reads information overlap — reporting
  * both is standard because they fail differently (ARI discounts
  * small-cluster luck, NMI tolerates splits).
  *
  *   ARI = (Σᵢⱼ C(nᵢⱼ,2) − E) / (½(ΣC(aᵢ,2)+ΣC(bⱼ,2)) − E),
  *     E = ΣC(aᵢ,2)·ΣC(bⱼ,2)/C(n,2)
  *   NMI = 2·I(A;B) / (H(A)+H(B))
  *
  * Exactness: ONE (a, b) contingency census; all pair counts are
  * exact BigInt on the driver (C(n,2) ≈ 10²⁴ at 10¹² rows — past
  * int64); ARI closes in doubles from those integers. The entropies
  * fold ln terms in cell order (the q321 exp/ln precedent: ln is the
  * one libm call both engines agree on at 6 dp after the fold).
  *
  * Scale shape: one map-side-combined census bounded at 2¹² cells
  * (clusterings are vocabulary-sized by construction); the algebra is
  * O(cells) on the driver. One row: (n, cells_a, cells_b, ari, nmi). */
object ClusterAgreement {

  def ariNmi(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    Pinned.withCheckpoint(df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    ) { census =>
      val cells = Grids.collectBounded(census,
        "ariNmi contingency grid", maxRows = 1 << 12)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2)))
        .sortBy(c => (c._1, c._2))
      require(cells.nonEmpty, "ariNmi: empty input")
      val n = cells.map(c => BigInt(c._3)).sum
      require(n >= 2, s"ariNmi: $n rows")
      def c2(x: BigInt): BigInt = x * (x - 1) / 2
      val aTot = cells.groupBy(_._1).map { case (k, cs) =>
        k -> cs.map(c => BigInt(c._3)).sum }
      val bTot = cells.groupBy(_._2).map { case (k, cs) =>
        k -> cs.map(c => BigInt(c._3)).sum }
      val sumIj = cells.map(c => c2(BigInt(c._3))).sum
      val sumA = aTot.values.map(c2).sum
      val sumB = bTot.values.map(c2).sum
      val total = c2(n)
      require(sumA < total && sumB < total,
        "ariNmi: a side is one single cluster — agreement undefined " +
          "(expected index equals the maximum)")
      val e = sumA.toDouble * sumB.toDouble / total.toDouble
      val ari = (sumIj.toDouble - e) /
        ((sumA.toDouble + sumB.toDouble) / 2.0 - e)
      // entropies and MI fold in (a, b) cell order — the q321 ln rule
      val nD = n.toDouble
      var ha = 0.0
      aTot.toSeq.sortBy(_._1).foreach { case (_, c) =>
        val p = c.toDouble / nD; ha += -p * math.log(p) }
      var hb = 0.0
      bTot.toSeq.sortBy(_._1).foreach { case (_, c) =>
        val p = c.toDouble / nD; hb += -p * math.log(p) }
      var mi = 0.0
      cells.foreach { case (a, b, nij) =>
        val p = nij.toDouble / nD
        mi += p * math.log(p * nD * nD /
          (aTot(a).toDouble * bTot(b).toDouble))
      }
      require(ha + hb > 0.0,
        "ariNmi: both sides are single clusters — NMI undefined")
      val nmi = 2.0 * mi / (ha + hb)
      spark.range(1).select(lit(n.toLong).as("n"),
        lit(aTot.size.toLong).as("cells_a"),
        lit(bTot.size.toLong).as("cells_b"),
        round(lit(ari), 6).as("ari"), round(lit(nmi), 6).as("nmi"))
    }
  }
}
