package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Revenue bridge (price/volume decomposition) between two periods —
  * the FP&A waterfall every "revenue is up 7%" number hides: per
  * segment, ΔR splits EXACTLY into a volume effect at old prices,
  * (q₂−q₁)·p₁, and a price effect at new volumes, (p₂−p₁)·q₂ — the
  * Laspeyres-volume/Paasche-price convention, whose two terms sum to
  * ΔR identically (algebra, not approximation), so the bridge always
  * reconciles. Mix shifts between segments show as offsetting
  * segment rows — visible here, invisible in the total.
  *
  * Exactness: per-(segment, period) revenue cents and unit counts are
  * exact BIGINTs; ΔR is published exact; the two effects are single
  * fixed double trees over exact integers (p = r/q), and the
  * reconciliation is checked per segment at 6 dp inside the operator.
  * Segments missing a period (or with zero volume) refuse loudly —
  * NULL-ing an effect would un-reconcile the waterfall silently.
  *
  * Scale shape: one map-side-combined (segment, period) census; the
  * bridge closes on segment cells (metadata-bounded, 2¹⁰). */
object Bridge {

  /** Rows per segment: (segment, qty1, qty2, rev1_cents, rev2_cents,
    * delta_cents, volume_effect, price_effect), ordered by segment. */
  def revenueBridge(df: DataFrame, segCol: String, periodCol: String,
                    qtyCol: String, centsCol: String,
                    p1: Long, p2: Long): DataFrame = {
    require(p1 != p2, "revenueBridge: identical periods")
    val u = df.filter(col(segCol).isNotNull && col(periodCol).isNotNull &&
        col(qtyCol).isNotNull && col(centsCol).isNotNull &&
        (col(periodCol) === p1 || col(periodCol) === p2))
      .select(col(segCol).cast("string").as("__g"),
        col(periodCol).cast("long").as("__p"),
        col(qtyCol).cast("long").as("__q"),
        col(centsCol).cast("long").as("__r"))
    val cells = u.groupBy(col("__g"))
      .agg(sum(when(col("__p") === p1, col("__q")).otherwise(0L)).as("q1"),
        sum(when(col("__p") === p2, col("__q")).otherwise(0L)).as("q2"),
        sum(when(col("__p") === p1, col("__r")).otherwise(0L)).as("r1"),
        sum(when(col("__p") === p2, col("__r")).otherwise(0L)).as("r2"))
    Pinned.withCheckpoint(cells) { cs =>
      val k = cs.count()
      require(k >= 1 && k <= (1 << 10),
        s"revenueBridge: $k segments outside [1, 1024]")
      val degenerate = cs.filter(col("q1") <= 0 || col("q2") <= 0).count()
      require(degenerate == 0,
        s"revenueBridge: $degenerate segment(s) without volume in both " +
          "periods — the bridge cannot reconcile; filter or merge them " +
          "first, loudly")
      val price1 = col("r1").cast("double") / col("q1").cast("double")
      val price2 = col("r2").cast("double") / col("q2").cast("double")
      val vol = (col("q2") - col("q1")).cast("double") * price1
      val prc = (price2 - price1) * col("q2").cast("double")
      val out = cs.select(col("__g").as("segment"),
        col("q1").as("qty1"), col("q2").as("qty2"),
        col("r1").as("rev1_cents"), col("r2").as("rev2_cents"),
        (col("r2") - col("r1")).as("delta_cents"),
        round(vol, 6).as("volume_effect"),
        round(prc, 6).as("price_effect"))
        .orderBy(col("segment"))
      val bad = out.filter(
        abs(col("volume_effect") + col("price_effect") -
          col("delta_cents").cast("double")) >
          greatest(lit(0.01), abs(col("delta_cents")).cast("double") *
            lit(1e-9))).count()
      require(bad == 0,
        s"revenueBridge: $bad segment(s) failed the reconciliation " +
          "identity — overflow or a broken input")
      Grids.collectBounded(out, "revenueBridge segment grid")
    }
  }
}
