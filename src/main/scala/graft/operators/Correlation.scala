package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank correlation between two metrics on a shared time grid — the
  * bivariate companions to [[TrendTests]]: does volume move with
  * value, does latency track queue depth, did the quality score stay
  * coupled to human ratings after a model swap. Rank methods because
  * monitoring pairs are routinely non-linear and heavy-tailed — a
  * Pearson r is owned by the biggest hour.
  *
  *  - [[kendallTauB]]: concordant/discordant pairs with the τ-b tie
  *    normalization (Kendall 1945) — exact BIGINT pair census
  *    (conc/disc/tx/ty/txy), one closing double tree.
  *  - [[spearmanRho]]: Pearson over AVERAGE ranks — fractional .5
  *    ranks cleared by 2-scaling (rank2 = 2·rank + ties − 1, an exact
  *    BIGINT), then the correlation closes from six exact sums.
  *
  * Both are partitioning-invariant and engine-replayable: every
  * decision is integer arithmetic; doubles appear only in the final
  * expression. Scale shape: one map-side-combined grid aggregate over
  * the corpus; τ's pair join is grid² (calendar-bounded, the
  * TrendTests contract) and ρ's rank windows run on the grid (the
  * Seasonal idiom). */
object Correlation {

  private def grid(df: DataFrame, tCol: String, xCol: String,
                   yCol: String): DataFrame =
    df.select(col(tCol).cast("long").as("t"),
        col(xCol).cast("decimal(38,6)").as("x"),
        col(yCol).cast("decimal(38,6)").as("y"))
      .filter(col("t").isNotNull && col("x").isNotNull && col("y").isNotNull)

  /** One row: (n, n_pairs, conc, disc, ties_x, ties_y, ties_xy,
    * tau_b) — NULL τ when either margin is all-ties. */
  def kendallTauB(df: DataFrame, tCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val g = grid(df, tCol, xCol, yCol)
    val ga = g.select(col("t").as("ta"), col("x").as("xa"), col("y").as("ya"))
    val gb = g.select(col("t").as("tb"), col("x").as("xb"), col("y").as("yb"))
    val up = (a: String, b: String) => col(b) > col(a)
    val dn = (a: String, b: String) => col(b) < col(a)
    val eq = (a: String, b: String) => col(b) === col(a)
    val p = ga.join(gb, col("ta") < col("tb")).agg(
      count(lit(1)).as("n_pairs"),
      sum(when((up("xa", "xb") && up("ya", "yb")) ||
        (dn("xa", "xb") && dn("ya", "yb")), 1L).otherwise(0L)).as("conc"),
      sum(when((up("xa", "xb") && dn("ya", "yb")) ||
        (dn("xa", "xb") && up("ya", "yb")), 1L).otherwise(0L)).as("disc"),
      sum(when(eq("xa", "xb") && !eq("ya", "yb"), 1L).otherwise(0L))
        .as("ties_x"),
      sum(when(eq("ya", "yb") && !eq("xa", "xb"), 1L).otherwise(0L))
        .as("ties_y"),
      sum(when(eq("xa", "xb") && eq("ya", "yb"), 1L).otherwise(0L))
        .as("ties_xy"))
    val n = g.agg(count(lit(1)).as("n"))
    n.crossJoin(broadcast(p)).select(col("n"), col("n_pairs"),
      col("conc"), col("disc"), col("ties_x"), col("ties_y"), col("ties_xy"),
      when((col("n_pairs") === col("ties_x") + col("ties_xy")) ||
          (col("n_pairs") === col("ties_y") + col("ties_xy")),
        lit(null).cast("double"))
        .otherwise((col("conc") - col("disc")).cast("double") /
          sqrt((col("n_pairs") - col("ties_x") - col("ties_xy")).cast("double")
            * (col("n_pairs") - col("ties_y") - col("ties_xy"))
              .cast("double")))
        .as("tau_b"))
  }

  /** One row: (n, rho) — Spearman's ρ with average ranks; NULL when
    * either margin is constant. */
  def spearmanRho(df: DataFrame, tCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val g = grid(df, tCol, xCol, yCol)
    // 2-scaled average rank: 2·rank + |ties| − 1 (exact BIGINT).
    // CONTRACT: the unpartitioned rank windows are sound ONLY on the
    // calendar-bounded grid (one row per time position) — corpus-scale
    // callers must pre-aggregate to the grid first
    def rank2(c: String): org.apache.spark.sql.Column =
      (rank().over(Window.orderBy(col(c))) * 2 +
        count(lit(1)).over(Window.partitionBy(col(c))) - 1).cast("long")
    val r = g.select(rank2("x").as("rx"), rank2("y").as("ry"))
    val s = r.agg(count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("ry")).as("sxy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"))
    s.select(col("n"),
      when((col("n") * col("sxx") === col("sx") * col("sx")) ||
          (col("n") * col("syy") === col("sy") * col("sy")),
        lit(null).cast("double"))
        .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
        .as("rho"))
  }

  /** Chatterjee's ξ (Chatterjee 2021, JASA) — the dependence measure
    * [[kendallTauB]]/[[spearmanRho]] CANNOT be: both score a perfect
    * parabola near 0 (monotone association only); ξ converges to a
    * measure of functional dependence — 0 iff independent, 1 iff y is
    * a measurable function of x, monotone or not. The ties-general
    * form on rows sorted by x:
    *
    *   ξ = 1 − n·Σᵢ|r₍ᵢ₊₁₎ − r₍ᵢ₎| / (2·Σᵢ lᵢ(n − lᵢ))
    *
    * with r_i = #{j: y_j ≤ y_i} and l_i = #{j: y_j ≥ y_i}. X-ties are
    * broken by `idCol` (Chatterjee randomizes; a replayable engine
    * pins the order instead — documented contract, the estimate is
    * one valid tie-resolution).
    *
    * Exactness: r and l come exactly from the y-value census; the
    * |Δr| sum and denominator are exact BIGINTs (n ≤ 2¹², so
    * l(n−l)·n < 2⁶³ by far); ξ is one closing double. Integer-scaled
    * x and y only. One row: (n, sum_abs_dr, denom, xi).
    *
    * Scale shape: the input must already BE a grid (the Seasonal
    * idiom), loudly bounded at 2¹² positions; the x-ordered lag window
    * and the census windows run on grid rows. */
  /** Partial Pearson correlation r(x,y | z) — the CONFOUNDER read the
    * pairwise family (q257/q258) cannot give: x and y can correlate
    * 0.6 purely because both ride z (volume and revenue both ride
    * active users); partialling z out answers whether any DIRECT
    * association remains:
    *
    *   r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²))
    *
    * INTEGER-DOMAIN CONTRACT (the ols2 idiom): all three columns
    * integer-scaled; the nine sufficient statistics are exact
    * DECIMAL(38,0) sums, every r closes from centered moments in one
    * fixed double tree — ONE corpus pass, SQL-replayable.
    * Near-collinearity with z (|r_xz| = 1) refuses. One row:
    * (n, r_xy, r_xz, r_yz, r_xy_given_z). */
  def partialPearson(df: DataFrame, xCol: String, yCol: String,
                     zCol: String): DataFrame = {
    val d0 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(zCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"), col(zCol).cast("long").as("__z"))
    val r = u.agg(count(lit(1)).as("n"),
      sum(d0(col("__x"))).as("sx"), sum(d0(col("__y"))).as("sy"),
      sum(d0(col("__z"))).as("sz"),
      sum(d0(d0(col("__x")) * col("__x"))).as("sxx"),
      sum(d0(d0(col("__y")) * col("__y"))).as("syy"),
      sum(d0(d0(col("__z")) * col("__z"))).as("szz"),
      sum(d0(d0(col("__x")) * col("__y"))).as("sxy"),
      sum(d0(d0(col("__x")) * col("__z"))).as("sxz"),
      sum(d0(d0(col("__y")) * col("__z"))).as("syz")).head()
    val n = r.getLong(0)
    require(n >= 4, s"partialPearson needs >= 4 rows, got $n")
    val Seq(sx, sy, sz, sxx, syy, szz, sxy, sxz, syz) =
      (1 to 9).map(i => BigDecimal(r.getDecimal(i)))
    def c(ij: BigDecimal, i: BigDecimal, j: BigDecimal): Double =
      ij.toDouble * n - i.toDouble * j.toDouble
    val cxx = c(sxx, sx, sx); val cyy = c(syy, sy, sy)
    val czz = c(szz, sz, sz)
    require(cxx > 0.0 && cyy > 0.0 && czz > 0.0,
      "partialPearson: a constant column")
    val rxy = c(sxy, sx, sy) / math.sqrt(cxx * cyy)
    val rxz = c(sxz, sx, sz) / math.sqrt(cxx * czz)
    val ryz = c(syz, sy, sz) / math.sqrt(cyy * czz)
    val den = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    require(den > 0.0,
      "partialPearson: x or y is collinear with z — the partial is " +
        "undefined")
    val part = (rxy - rxz * ryz) / math.sqrt(den)
    val spark = df.sparkSession
    spark.range(1).select(lit(n).as("n"),
      round(lit(rxy), 6).as("r_xy"), round(lit(rxz), 6).as("r_xz"),
      round(lit(ryz), 6).as("r_yz"),
      round(lit(part), 6).as("r_xy_given_z"))
  }

  /** Empirical upper-tail dependence λ_U(p) — the EXTREMES question
    * every body-of-distribution correlation (q257/q258/q356) leaves
    * open: "when y spikes past its p-quantile, how often does x spike
    * WITH it". Two series can be ρ = 0.6 correlated yet tail-
    * independent (Gaussian copula: λ_U = 0 — the risk-model failure
    * mode), or weakly correlated yet tail-locked. λ_U(p) =
    * P(X > q_x(p) | Y > q_y(p)), with the joint/product lift beside it
    * (lift ≈ 1 ⇒ independent tails; 1/(1−p) ⇒ fully locked).
    *
    * Exactness: both thresholds are exact type-1 order statistics
    * (smallest value with cumulative count ≥ ⌈p·n⌉ — integer rank
    * arithmetic, no interpolation); exceedance counts are exact
    * BIGINTs; λ and lift are closing divisions.
    *
    * Scale shape: two distinct-value censuses for the thresholds + one
    * joint-exceedance count — all map-side-combined; nothing sorts the
    * corpus. The input is (x, y) pairs; p ∈ (0.5, 1). */
  def upperTailDependence(df: DataFrame, xCol: String, yCol: String,
                          pNum: Int, pDen: Int): DataFrame = {
    require(pDen > 0 && pNum * 2 > pDen && pNum < pDen,
      s"upperTailDependence: p = $pNum/$pDen outside (0.5, 1)")
    val u = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(u) { uu =>
      val n = uu.count()
      require(n >= pDen, s"upperTailDependence: n=$n < pDen=$pDen")
      // exact rank ⌈p·n⌉ threshold off each margin's value census
      def threshold(c: String): Long = {
        val wv = Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        uu.groupBy(col(c)).agg(count(lit(1)).as("__c"))
          .withColumn("__hi", sum(col("__c")).over(wv))
          .filter(col("__hi") >= lit((pNum * n + pDen - 1) / pDen))
          .agg(min(col(c))).head().getLong(0)
      }
      val (qx, qy) = (threshold("__x"), threshold("__y"))
      val r = uu.agg(
        sum(when(col("__x") > qx, 1L).otherwise(0L)).as("nx"),
        sum(when(col("__y") > qy, 1L).otherwise(0L)).as("ny"),
        sum(when(col("__x") > qx && col("__y") > qy, 1L).otherwise(0L))
          .as("nj")).head()
      val (nx, ny, nj) = (r.getLong(0), r.getLong(1), r.getLong(2))
      require(ny > 0 && nx > 0,
        s"upperTailDependence: empty exceedance set (nx=$nx, ny=$ny) — " +
          "the margin is constant above its quantile; lower p")
      spark.range(1).select(lit(n).as("n"), lit(qx).as("q_x"),
        lit(qy).as("q_y"), lit(nx).as("n_x_exc"), lit(ny).as("n_y_exc"),
        lit(nj).as("n_joint"),
        round(lit(nj.toDouble / ny.toDouble), 6).as("lambda_u"),
        round(lit(n.toDouble * nj.toDouble / (nx.toDouble * ny.toDouble)),
          6).as("lift"))
    }
  }

  def chatterjeeXi(df: DataFrame, xCol: String, yCol: String,
                   idCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    Seq(xCol, yCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"chatterjeeXi: '$c' is $dt — integer-scaled only")
    }
    Pinned.withCheckpoint(df
      .select(col(idCol).cast("long").as("__id"),
        col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .filter(col("__id").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    ) { g =>
      val spark = g.sparkSession
      val n = g.count()
      require(n >= 3 && n <= (1 << 12),
        s"chatterjeeXi: $n grid positions outside [3, 4096] — " +
          "pre-aggregate onto a bounded grid first (the Seasonal idiom)")
      val wy = Window.orderBy(col("__y"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val census = g.groupBy(col("__y")).agg(count(lit(1)).as("__t"))
        .withColumn("__cum", sum(col("__t")).over(wy))
        .withColumn("__r", col("__cum"))
        .withColumn("__l", lit(n) - col("__cum") + col("__t"))
      val den = census
        .agg(sum(col("__t") * col("__l") * (lit(n) - col("__l"))))
        .head().getLong(0)
      require(den > 0, "chatterjeeXi: y is constant — ξ undefined")
      val wx = Window.orderBy(col("__x"), col("__id"))
      val num = g.join(census.select(col("__y"), col("__r")), "__y")
        .withColumn("__dr",
          abs(col("__r") - lag(col("__r"), 1).over(wx)))
        .agg(coalesce(sum(col("__dr")), lit(0L))).head().getLong(0)
      val xi = 1.0 - n.toDouble * num.toDouble / (2.0 * den.toDouble)
      spark.range(1).select(lit(n).as("n"),
        lit(num).as("sum_abs_dr"), lit(2L * den).as("denom"),
        round(lit(xi), 6).as("xi"))
    }
  }
}
