package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quasi-experimental causal estimators — the first CAUSAL family in
  * the engine (round 17): the A/B layer (Experiments/Uplift/CUPED)
  * assumes randomized assignment; these two estimators are what a
  * data team reaches for when assignment was NOT randomized but
  * nature left a usable seam — a before/after boundary shared with an
  * untreated group (difference-in-differences) or an arbitrary
  * eligibility cutoff on a running variable (regression
  * discontinuity).
  *
  * Exactness: both estimators are one-pass sufficient-statistic
  * aggregates in the house decimal-ledger discipline (the
  * [[Regression]] shape): exact DECIMAL sums per cell/side, a fixed
  * closing double tree, loud refusals on degenerate designs. No
  * iteration, no learning rate — a 100 TB fit is one
  * map-side-combined aggregate either way.
  */
object Causal {

  private def dec(c: Column) = c.cast("decimal(18,6)")
  private def dsum(c: Column) = sum(c).cast("decimal(38,12)")

  /** 2×2 difference-in-differences with a parallel-trends pre-check.
    *
    * The DiD estimate is the interaction of the four cell means:
    * (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — unbiased iff the
    * two groups would have moved in parallel absent treatment. That
    * assumption is CHECKABLE on pre-period data, so the estimator
    * refuses to ship a naked number: the output carries each group's
    * pre-period OLS time slope (exact ledgers over the (tick, mean)
    * grid is the textbook version; here the slope fits the raw
    * pre-period rows directly — same estimand, no intermediate grid)
    * and their gap. A reader who ignores `pre_slope_gap` is ignoring
    * the identifying assumption by name.
    *
    * `tickCol` must be a numeric time index (e.g. day number); rows
    * split by `treated` × `post`. One pass: eight decimal sums per
    * cell (the four cells share one grouped aggregate).
    *
    * Output (one row): n per cell, the four cell means, `did`, each
    * group's pre-period slope and `pre_slope_gap` — all closing
    * doubles over exact sums, floor-scaled to 4dp (see the body note
    * on why round(,6) is not replayable at cent scale). */
  def diffInDiff(df: DataFrame, valueCol: String, tickCol: String,
                 treated: Column, post: Column): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull && col(tickCol).isNotNull)
      .select(dec(col(valueCol)).as("__y"), dec(col(tickCol)).as("__t"),
        treated.cast("boolean").as("__g"), post.cast("boolean").as("__p"))
      .filter(col("__g").isNotNull && col("__p").isNotNull)
    val cells = rows.groupBy(col("__g"), col("__p"))
      .agg(count(lit(1)).as("n"), dsum(col("__y")).as("sy"),
        dsum(col("__t")).as("st"), dsum(col("__t") * col("__t")).as("stt"),
        dsum(col("__t") * col("__y")).as("sty"))
      .collect()
    require(cells.length == 4,
      s"diffInDiff needs all four (treated × post) cells populated, " +
        s"got ${cells.length}")
    case class Cell(n: Long, sy: BigDecimal, st: BigDecimal,
                    stt: BigDecimal, sty: BigDecimal)
    val m = cells.map { r =>
      (r.getBoolean(0), r.getBoolean(1)) -> Cell(r.getLong(2),
        BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4)),
        BigDecimal(r.getDecimal(5)), BigDecimal(r.getDecimal(6)))
    }.toMap
    def mean(c: Cell): Double = c.sy.toDouble / c.n
    // pre-period slope per group: classic centered OLS on exact sums
    def slope(c: Cell): Double = {
      val den = c.stt.toDouble * c.n - c.st.toDouble * c.st.toDouble
      require(den != 0.0,
        "diffInDiff: a pre-period has a degenerate time axis (all rows " +
          "on one tick) — the parallel-trends check is undefined")
      (c.sty.toDouble * c.n - c.st.toDouble * c.sy.toDouble) / den
    }
    val (tPre, tPost) = (m((true, false)), m((true, true)))
    val (cPre, cPost) = (m((false, false)), m((false, true)))
    val did = (mean(tPost) - mean(tPre)) - (mean(cPost) - mean(cPre))
    val (sT, sC) = (slope(tPre), slope(cPre))
    val spark = df.sparkSession
    import spark.implicits._
    val raw = Seq((tPre.n, tPost.n, cPre.n, cPost.n,
      mean(tPre), mean(tPost), mean(cPre), mean(cPost), did,
      sT, sC, sT - sC))
      .toDF("n_t_pre", "n_t_post", "n_c_pre", "n_c_post",
        "mean_t_pre", "mean_t_post", "mean_c_pre", "mean_c_post", "did",
        "pre_slope_t", "pre_slope_c", "pre_slope_gap")
    // Closing round via floor-scaling, NOT round(,6): outcomes here can
    // be cent-scaled (1e8+), where Spark's decimal-exact HALF_UP and
    // DuckDB's float-scaled round disagree at boundaries. floor(x*1e4)
    // is a pure IEEE op on bit-identical doubles -> bit-identical in
    // any engine, at any magnitude the product keeps exact (< 2^53).
    def f4(c: org.apache.spark.sql.Column) = floor(c * lit(10000.0)) / lit(10000.0)
    raw.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
      col("n_c_post"),
      f4(col("mean_t_pre")).as("mean_t_pre"),
      f4(col("mean_t_post")).as("mean_t_post"),
      f4(col("mean_c_pre")).as("mean_c_pre"),
      f4(col("mean_c_post")).as("mean_c_post"),
      f4(col("did")).as("did"),
      f4(col("pre_slope_t")).as("pre_slope_t"),
      f4(col("pre_slope_c")).as("pre_slope_c"),
      f4(col("pre_slope_gap")).as("pre_slope_gap"))
  }

  /** Sharp regression discontinuity: local linear fit on each side of
    * `cutoff` within `bandwidth` of it, discontinuity = the gap
    * between the two intercepts AT the cutoff.
    *
    * Local linear — not local means — because the running variable
    * usually trends into the cutoff, and a mean-difference would read
    * that trend as treatment (the textbook RD failure). Uniform kernel
    * within the bandwidth: the one kernel whose fit is an exact
    * sufficient-statistic aggregate (triangular kernels weight by
    * |x−c|, which is still one pass but obscures the replay; uniform
    * is the standard robustness baseline).
    *
    * Output (one row): per-side n, slope, intercept-at-cutoff, the
    * `gap` (right minus left), plus each side's R² — a near-zero R²
    * on both sides says the running variable doesn't predict the
    * outcome and the gap is noise. Refuses sides with < 3 rows or a
    * degenerate x axis. */
  def regressionDiscontinuity(df: DataFrame, runningCol: String,
                              outcomeCol: String, cutoff: Double,
                              bandwidth: Double): DataFrame = {
    require(bandwidth > 0, s"bandwidth must be positive, got $bandwidth")
    val rows = df.filter(col(runningCol).isNotNull && col(outcomeCol).isNotNull)
      .select((dec(col(runningCol)) - dec(lit(cutoff))).as("__x"),
        dec(col(outcomeCol)).as("__y"))
      .filter(abs(col("__x")) <= lit(bandwidth))
      .withColumn("__side", col("__x") >= 0)
    val sides = rows.groupBy(col("__side"))
      .agg(count(lit(1)).as("n"), dsum(col("__x")).as("sx"),
        dsum(col("__y")).as("sy"), dsum(col("__x") * col("__x")).as("sxx"),
        dsum(col("__x") * col("__y")).as("sxy"),
        dsum(col("__y") * col("__y")).as("syy"))
      .collect()
    require(sides.length == 2,
      "regressionDiscontinuity: one side of the cutoff has no rows " +
        "inside the bandwidth")
    def fit(r: org.apache.spark.sql.Row): (Long, Double, Double, Double) = {
      val n = r.getLong(1)
      require(n >= 3, s"regressionDiscontinuity: a side has only $n rows " +
        "inside the bandwidth (need >= 3)")
      val Seq(sx, sy, sxx, sxy, syy) =
        (2 to 6).map(i => BigDecimal(r.getDecimal(i)))
      val den = sxx.toDouble * n - sx.toDouble * sx.toDouble
      require(den != 0.0, "regressionDiscontinuity: degenerate running " +
        "variable (all rows at one value) on a side")
      val b = (sxy.toDouble * n - sx.toDouble * sy.toDouble) / den
      val a = (sy.toDouble - b * sx.toDouble) / n
      val syyC = syy.toDouble * n - sy.toDouble * sy.toDouble
      val r2 = if (syyC == 0.0) 0.0
        else (sxy.toDouble * n - sx.toDouble * sy.toDouble) *
          (sxy.toDouble * n - sx.toDouble * sy.toDouble) / (den * syyC)
      (n, b, a, r2)
    }
    val bySide = sides.map(r => r.getBoolean(0) -> fit(r)).toMap
    val (nL, bL, aL, r2L) = bySide(false)
    val (nR, bR, aR, r2R) = bySide(true)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((nL, nR, aL, aR, aR - aL, bL, bR, r2L, r2R))
      .toDF("n_left", "n_right", "intercept_left", "intercept_right",
        "gap", "slope_left", "slope_right", "r2_left", "r2_right")
      .select(col("n_left"), col("n_right"),
        // floor-scaled closes (see diffInDiff): replayable at cent scale
        (floor(col("intercept_left") * lit(10000.0)) / lit(10000.0)).as("intercept_left"),
        (floor(col("intercept_right") * lit(10000.0)) / lit(10000.0)).as("intercept_right"),
        (floor(col("gap") * lit(10000.0)) / lit(10000.0)).as("gap"),
        (floor(col("slope_left") * lit(10000.0)) / lit(10000.0)).as("slope_left"),
        (floor(col("slope_right") * lit(10000.0)) / lit(10000.0)).as("slope_right"),
        (floor(col("r2_left") * lit(10000.0)) / lit(10000.0)).as("r2_left"),
        (floor(col("r2_right") * lit(10000.0)) / lit(10000.0)).as("r2_right"))
  }
  /** Oaxaca–Blinder decomposition of a two-group mean gap (Oaxaca
    * 1973, Blinder 1973) — the "is the gap composition or treatment"
    * split a raw group comparison hides: with per-group linear models
    * y = a_g + b_g·x,
    *
    *   ȳ_A − ȳ_B = b_B·(x̄_A − x̄_B)            EXPLAINED (endowments,
    *                                            priced at B's slope)
    *             + (a_A − a_B) + (b_A − b_B)·x̄_A  UNEXPLAINED
    *                                            (coefficients)
    *
    * — reference group B (the standard two-fold form; the choice is
    * part of the contract and documented in the output's column
    * names). Single covariate by design: that is where the
    * decomposition is exactly identified from the [[Regression.ols1]]
    * ledgers, and the one-covariate read ("how much of the spend gap
    * is balance mix") is the audit this family ships.
    *
    * Exactness: one grouped decimal-ledger aggregate (both groups in
    * one pass), fixed closing double tree, identity
    * gap = explained + unexplained holds to the last double bit by
    * construction. Refuses degenerate groups. */
  def oaxacaBlinder(df: DataFrame, groupCol: Column, xCol: String,
                    yCol: String): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(groupCol.cast("boolean").as("__g"),
        dec(col(xCol)).as("__x"), dec(col(yCol)).as("__y"))
      .filter(col("__g").isNotNull)
    val gs = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), dsum(col("__x")).as("sx"),
        dsum(col("__y")).as("sy"),
        dsum(col("__x") * col("__x")).as("sxx"),
        dsum(col("__x") * col("__y")).as("sxy"))
      .collect()
    require(gs.length == 2,
      "oaxacaBlinder: both groups must be populated")
    def fit(r: org.apache.spark.sql.Row): (Long, Double, Double, Double, Double) = {
      val n = r.getLong(1)
      require(n >= 3, s"oaxacaBlinder: a group has only $n rows (need >= 3)")
      val Seq(sx, sy, sxx, sxy) = (2 to 5).map(i => BigDecimal(r.getDecimal(i)))
      val den = sxx.toDouble * n - sx.toDouble * sx.toDouble
      require(den != 0.0, "oaxacaBlinder: degenerate covariate in a group")
      val b = (sxy.toDouble * n - sx.toDouble * sy.toDouble) / den
      val a = (sy.toDouble - b * sx.toDouble) / n
      (n, a, b, sx.toDouble / n, sy.toDouble / n)
    }
    val byG = gs.map(r => r.getBoolean(0) -> fit(r)).toMap
    val (nA, aA, bA, mxA, myA) = byG(true)
    val (nB, aB, bB, mxB, myB) = byG(false)
    val gap = myA - myB
    val explained = bB * (mxA - mxB)
    val unexplained = (aA - aB) + (bA - bB) * mxA
    val spark = df.sparkSession
    import spark.implicits._
    def f4d(x: Double): Double = math.floor(x * 10000.0) / 10000.0
    Seq((nA, nB, f4d(gap), f4d(explained), f4d(unexplained),
      f4d(bA), f4d(bB), f4d(mxA), f4d(mxB)))
      .toDF("n_a", "n_b", "gap", "explained_by_x", "unexplained",
        "slope_a", "slope_b", "mean_x_a", "mean_x_b")
  }
  /** Event-study profile — the DYNAMIC face of [[diffInDiff]]'s four
    * cells: the treated−control mean gap PER TICK, re-indexed relative
    * to the intervention. Flat pre-period gaps are the parallel-trends
    * assumption made visible tick by tick (the picture every DiD
    * referee asks for); the post-period gap path is the effect's
    * trajectory, which a single pooled `did` averages away (a fading
    * effect and a growing one can pool identically).
    *
    * Exactness: one grouped decimal-ledger census over (tick, group);
    * per-tick means and gaps close as doubles, floor-scaled. Ticks
    * missing a group emit NULL means/gap rather than silently
    * dropping (an empty treated cell in one tick is a finding).
    *
    * Scale shape: one map-side-combined census onto the (tick × 2)
    * grid; everything after runs on grid rows. */
  def eventStudy(df: DataFrame, valueCol: String, tickCol: String,
                 treated: Column, eventTick: Long): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull && col(tickCol).isNotNull)
      .select(dec(col(valueCol)).as("__y"),
        col(tickCol).cast("long").as("__t"),
        treated.cast("boolean").as("__g"))
      .filter(col("__g").isNotNull)
    val cells = rows.groupBy(col("__t"), col("__g"))
      .agg(count(lit(1)).as("__n"), dsum(col("__y")).as("__sy"))
    def side(g: Boolean, pfx: String) = cells.filter(col("__g") === g)
      .select(col("__t"), col("__n").as(s"n_$pfx"),
        (col("__sy").cast("double") / col("__n")).as(s"__m_$pfx"))
    val f4 = (c: Column) => floor(c * lit(10000.0)) / lit(10000.0)
    side(true, "t").join(side(false, "c"), Seq("__t"), "full")
      .select((col("__t") - lit(eventTick)).as("rel_tick"),
        coalesce(col("n_t"), lit(0L)).as("n_t"),
        coalesce(col("n_c"), lit(0L)).as("n_c"),
        f4(col("__m_t")).as("mean_t"), f4(col("__m_c")).as("mean_c"),
        f4(col("__m_t") - col("__m_c")).as("gap"))
      .orderBy(col("rel_tick"))
  }

  /** Randomization-inference DiD — the PLACEBO test that replaces a
    * distributional assumption with the design itself (Fisher-style;
    * the modern DiD practice when clusters are few): re-estimate the
    * DiD under `k` deterministic pseudo-assignments (unit-hash splits,
    * so replay is exact), and read where the REAL |did| ranks among
    * them. p = (1 + #{placebo |did| ≥ |real|}) / (k + 1) — if the real
    * assignment's effect is indistinguishable from hash noise, the
    * rank says so without a variance formula.
    *
    * Exactness: ONE grouped decimal-ledger census over
    * ((assignment j) × group × post) — the unit rows fan out k+1 ways
    * (j = 0 is the real assignment), 4(k+1) cells total; every did
    * closes in the diffInDiff double tree; the rank is integer. A
    * placebo with an empty cell refuses loudly (k too large for the
    * unit count).
    *
    * Scale shape: the fan-out is a map-side k+1 multiplier into one
    * census — no per-placebo passes; cells are 4(k+1) rows. */
  def placeboDid(df: DataFrame, valueCol: String, unitCol: String,
                 treated: Column, post: Column, k: Int = 16): DataFrame = {
    require(k >= 4 && k <= 64, s"placeboDid: k=$k outside [4, 64]")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.filter(col(valueCol).isNotNull)
      .select(dec(col(valueCol)).as("__y"), col(unitCol).as("__u"),
        treated.cast("boolean").as("__g0"), post.cast("boolean").as("__p"))
      .filter(col("__g0").isNotNull && col("__p").isNotNull)
    val js = (0 to k).toDF("__j")
    // j is mixed via a LARGE ODD MULTIPLIER (j * 2246822519) added into
    // the pre-multiply state before the h2 stage, and the assignment bit
    // xors two distant bit positions of the final mix (an r17 advisor
    // finding: the old +97*j mix left adjacent pseudo-assignments
    // correlated over clustered unit-id ranges, shrinking the effective
    // k — the large-constant spread plus the two-tap xor decorrelates
    // them, measured by CausalSpec). The mix is still ADDITIVE in j; the
    // decorrelation comes from the constant's size, not a j-multiply.
    val h1 = (abs(col("__u").cast("long")) % lit(2147483648L) * lit(2654435761L)
      + col("__j") * lit(2246822519L)) % lit(2147483648L)
    val h2 = (h1 * lit(1597334677L)) % lit(2147483648L)
    val fanned = rows.crossJoin(broadcast(js))
      .withColumn("__g", when(col("__j") === 0, col("__g0"))
        .otherwise(
          (shiftright(h2, 15).bitwiseXOR(shiftright(h2, 7))) % 2 === 1))
    val cells = fanned.groupBy(col("__j"), col("__g"), col("__p"))
      .agg(count(lit(1)).as("n"), dsum(col("__y")).as("sy"))
      .collect()
    require(cells.length == 4 * (k + 1),
      s"placeboDid: ${4 * (k + 1) - cells.length} empty (assignment × " +
        "group × post) cell(s) — k too large for the unit count")
    val byJ = cells.groupBy(_.getInt(0))
    def didOf(j: Int): Double = {
      val m = byJ(j).map(r => (r.getBoolean(1), r.getBoolean(2)) ->
        (BigDecimal(r.getDecimal(4)).toDouble / r.getLong(3))).toMap
      (m((true, true)) - m((true, false))) -
        (m((false, true)) - m((false, false)))
    }
    val real = didOf(0)
    val placebos = (1 to k).map(didOf)
    val nGe = placebos.count(p => math.abs(p) >= math.abs(real))
    def f4d(x: Double): Double = math.floor(x * 10000.0) / 10000.0
    val sorted = placebos.map(math.abs).sorted
    Seq((f4d(real), k, nGe, (1.0 + nGe) / (k + 1).toDouble,
      f4d(sorted.head), f4d(sorted(k / 2)), f4d(sorted.last)))
      .toDF("did_real", "n_placebos", "n_ge_real", "p_value",
        "placebo_abs_min", "placebo_abs_med", "placebo_abs_max")
      .select(col("did_real"), col("n_placebos"), col("n_ge_real"),
        round(col("p_value"), 6).as("p_value"),
        col("placebo_abs_min"), col("placebo_abs_med"),
        col("placebo_abs_max"))
  }
}
