package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segmented (one-breakpoint) least squares — the "where does the
  * relationship KINK" fit between q173/q262's single line and q253's
  * robust slope: price breaks at a quantity threshold, latency breaks
  * at a payload size, quality breaks at a document length. For every
  * candidate breakpoint v the model is two independent OLS lines on
  * x ≤ v and x > v; the reported breakpoint minimises total SSE
  * (Hudson 1966 — the discontinuous two-phase form, exact because
  * both sides close from sufficient statistics).
  *
  * Scale shape — the [[Stump]] census discipline for regression: ONE
  * map-side-combined pass builds per-distinct-x sufficient statistics
  * (n, Σx, Σy, Σxx, Σxy, Σyy — exact decimals of DECIMAL(18,6) casts),
  * cumulative windows over the ≤4096-value grid (loud require) give
  * every breakpoint's left/right stats simultaneously, and each SSE
  * closes in the fixed q262 double tree (decimal→double once, centered
  * moments, one division). Candidates with a degenerate side (< 2
  * rows or zero x-variance) are excluded — a vertical side has no
  * line. The argmin compares doubles produced by the SAME tree in
  * both engines (the q262 replay contract) with a breakpoint
  * tiebreak. */
object Segmented {

  /** One row: (breakpoint, n_left, n_right, slope_left,
    * intercept_left, slope_right, intercept_right, mse_split,
    * mse_single, mse_gain) — mse = SSE/n, so the argmin over
    * mse_split is the argmin over total SSE. */
  def fit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("decimal(18,6)").as("__x"),
        col(yCol).cast("decimal(18,6)").as("__y"))
    val cells = u.groupBy(col("__x"))
      .agg(count(lit(1)).as("c"),
        sum(col("__x")).cast("decimal(38,12)").as("sx"),
        sum(col("__y")).cast("decimal(38,12)").as("sy"),
        sum(col("__x") * col("__x")).cast("decimal(38,12)").as("sxx"),
        sum(col("__x") * col("__y")).cast("decimal(38,12)").as("sxy"),
        sum(col("__y") * col("__y")).cast("decimal(38,12)").as("syy"))
    val grid = cells.count()
    require(grid >= 3, s"segmented fit: $grid distinct x values (need >= 3)")
    require(grid <= (1 << 12),
      s"segmented fit: $grid distinct x values exceeds the 4096 grid " +
        "bound — pre-bucket x first (the Stump discipline)")
    val w = Window.orderBy(col("__x")) // grid-bounded by the require
    val cum = cells
      .withColumn("cn", sum(col("c")).over(w))
      .withColumn("cx", sum(col("sx")).over(w).cast("decimal(38,12)"))
      .withColumn("cy", sum(col("sy")).over(w).cast("decimal(38,12)"))
      .withColumn("cxx", sum(col("sxx")).over(w).cast("decimal(38,12)"))
      .withColumn("cxy", sum(col("sxy")).over(w).cast("decimal(38,12)"))
      .withColumn("cyy", sum(col("syy")).over(w).cast("decimal(38,12)"))
    val tot = cum.agg(max(col("cn")).as("tn"),
      max(col("cx")).as("tx"), max(col("cy")).as("ty"),
      max(col("cxx")).as("txx"), max(col("cxy")).as("txy"),
      max(col("cyy")).as("tyy"))
    // the q262 close: decimal→double ONCE, centered moments n·Sab−Sa·Sb,
    // SSE = (Cyy − Cxy²/Cxx)/n  (the n-scaled identity: centered moments
    // here are n²-scaled, so SSE·n² = Cyy·n... kept consistent by using
    // the same scaling on both sides of the argmin)
    def sse(n: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
            sy: org.apache.spark.sql.Column, sxx: org.apache.spark.sql.Column,
            sxy: org.apache.spark.sql.Column,
            syy: org.apache.spark.sql.Column) = {
      val cxx = sxx.cast("double") * n - sx.cast("double") * sx.cast("double")
      val cxy = sxy.cast("double") * n - sx.cast("double") * sy.cast("double")
      val cyy = syy.cast("double") * n - sy.cast("double") * sy.cast("double")
      ((cyy - cxy * cxy / cxx) / (n.cast("double") * n.cast("double")),
        cxy / cxx,
        (sy.cast("double") - (cxy / cxx) * sx.cast("double")) /
          n.cast("double"))
    }
    val withTot = cum.crossJoin(broadcast(tot))
      .withColumn("rn", col("cn"))
      .withColumn("nl", col("cn"))
      .withColumn("nr", col("tn") - col("cn"))
      .filter(col("nl") >= 2 && col("nr") >= 2)
      // exclude zero-x-variance sides (all mass on one distinct x)
      .withColumn("__cxxl", col("cxx").cast("double") * col("nl") -
        col("cx").cast("double") * col("cx").cast("double"))
      .withColumn("__cxxr",
        (col("txx") - col("cxx")).cast("double") * col("nr") -
          (col("tx") - col("cx")).cast("double") *
          (col("tx") - col("cx")).cast("double"))
      .filter(col("__cxxl") > 0 && col("__cxxr") > 0)
    val (sseL, slopeL, iceptL) = (col("__sseL"), col("__bL"), col("__aL"))
    val closed = {
      val (sl, bl, al) = sse(col("nl"), col("cx"), col("cy"),
        col("cxx"), col("cxy"), col("cyy"))
      val (sr, br, ar) = sse(col("nr"), col("tx") - col("cx"),
        col("ty") - col("cy"), col("txx") - col("cxx"),
        col("txy") - col("cxy"), col("tyy") - col("cyy"))
      val (st, _, _) = sse(col("tn"), col("tx"), col("ty"),
        col("txx"), col("txy"), col("tyy"))
      withTot
        .withColumn("__sseL", sl).withColumn("__bL", bl)
        .withColumn("__aL", al)
        .withColumn("__sseR", sr).withColumn("__bR", br)
        .withColumn("__aR", ar)
        .withColumn("__sseT", st)
    }
    closed
      .withColumn("__split",
        (sseL * col("nl") + col("__sseR") * col("nr")) / col("tn"))
      .orderBy(col("__split").asc, col("__x").asc)
      .limit(1)
      .select(col("__x").cast("double").as("breakpoint"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        round(slopeL, 6).as("slope_left"),
        round(iceptL, 6).as("intercept_left"),
        round(col("__bR"), 6).as("slope_right"),
        round(col("__aR"), 6).as("intercept_right"),
        round(col("__split"), 6).as("mse_split"),
        round(col("__sseT"), 6).as("mse_single"),
        round(lit(1.0) - col("__split") / col("__sseT"), 6)
          .as("mse_gain"))
  }
}
