package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bilateral price indices (Laspeyres / Paasche / Fisher) between two
  * periods over a (item, period, revenue, quantity) fact — the
  * inflation/price-architecture read a revenue bridge
  * ([[Bridge]]-style decompositions) leaves implicit: how much of the
  * revenue move is PRICE, holding the basket fixed?
  *
  * Per matched item i (traded in BOTH periods), the unit value
  * p_i,t = revenue_i,t / qty_i,t is the standard unit-value price at
  * item grain. Then
  *
  *   Laspeyres = Σ p₁q₀ / Σ p₀q₀   (base-period basket)
  *   Paasche   = Σ p₁q₁ / Σ p₀q₁   (current basket)
  *   Fisher    = √(L·P)            (the superlative compromise)
  *
  * with the denominators/numerators simplifying where the basket
  * matches its own period: Σ p₀q₀ = Σ revenue₀ and Σ p₁q₁ = Σ
  * revenue₁ — exact longs. The two cross terms Σ p₁q₀ and Σ p₀q₁
  * evaluate per item as one double each (rev·qty/qty — identical in
  * any engine) and cumulate as DECIMAL(38,12) (the replay pattern).
  * Items missing from either period drop (the matched-model index —
  * entry/exit belongs to a churn decomposition, not a price index),
  * and the output counts them so the coverage is visible.
  *
  * Scale shape: one (item, period) census, one matched self-join on
  * item, one global aggregate. */
object PriceIndex {

  /** One row: (n_matched, n_only_base, n_only_curr, rev_base,
    * rev_curr, laspeyres, paasche, fisher). Revenue enters in exact
    * integer cents; quantities as exact longs. `basePred`/`currPred`
    * select the two periods' rows. */
  def bilateral(df: DataFrame, itemCol: String, centsCol: String,
                qtyCol: String, basePred: org.apache.spark.sql.Column,
                currPred: org.apache.spark.sql.Column): DataFrame = {
    val rows = df.filter(col(itemCol).isNotNull && col(centsCol).isNotNull &&
        col(qtyCol).isNotNull)
      .select(col(itemCol).as("__i"), col(centsCol).cast("long").as("__r"),
        col(qtyCol).cast("long").as("__q"),
        when(basePred, 0).when(currPred, 1).as("__t"))
      .filter(col("__t").isNotNull)
    val per = rows.groupBy(col("__i"), col("__t"))
      .agg(sum(col("__r")).as("rev"), sum(col("__q")).as("qty"))
      .filter(col("qty") > 0)
    val b = per.filter(col("__t") === 0)
      .select(col("__i"), col("rev").as("r0"), col("qty").as("q0"))
    val c = per.filter(col("__t") === 1)
      .select(col("__i"), col("rev").as("r1"), col("qty").as("q1"))
    val m = b.join(c, "__i")
    val agg = m.agg(count(lit(1)).as("n"),
      sum(col("r0")).as("rev0"), sum(col("r1")).as("rev1"),
      // cross terms: p1*q0 = r1/q1*q0 and p0*q1 = r0/q0*q1, one double
      // per item, decimal-cumulated
      sum((col("r1").cast("double") / col("q1").cast("double") *
        col("q0").cast("double")).cast("decimal(38,12)")).as("p1q0"),
      sum((col("r0").cast("double") / col("q0").cast("double") *
        col("q1").cast("double")).cast("decimal(38,12)")).as("p0q1"))
      .head()
    val nM = agg.getLong(0)
    require(nM >= 1, "bilateral: no item traded in both periods")
    val rev0 = agg.getLong(1); val rev1 = agg.getLong(2)
    require(rev0 > 0 && rev1 > 0,
      s"bilateral: zero matched revenue (base=$rev0, curr=$rev1)")
    val p1q0 = BigDecimal(agg.getDecimal(3)).toDouble
    val p0q1 = BigDecimal(agg.getDecimal(4)).toDouble
    val lasp = p1q0 / rev0.toDouble
    val paas = rev1.toDouble / p0q1
    val onlyB = b.join(c, Seq("__i"), "left_anti").count()
    val onlyC = c.join(b, Seq("__i"), "left_anti").count()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((nM, onlyB, onlyC, rev0, rev1, lasp, paas, math.sqrt(lasp * paas)))
      .toDF("n_matched", "n_only_base", "n_only_curr", "rev_base",
        "rev_curr", "laspeyres", "paasche", "fisher")
      .select(col("n_matched"), col("n_only_base"), col("n_only_curr"),
        col("rev_base"), col("rev_curr"),
        round(col("laspeyres"), 6).as("laspeyres"),
        round(col("paasche"), 6).as("paasche"),
        round(col("fisher"), 6).as("fisher"))
  }
}
