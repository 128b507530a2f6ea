package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-analysis estimators over per-unit metric tables — the
  * A/B-readout layer above q152/q173's monitoring: CUPED
  * variance-reduced lift (Deng, Xu, Kohavi & Walker, WSDM 2013 — the
  * industry-standard pre-period adjustment), difference-in-differences
  * (the quasi-experimental fallback when assignment wasn't random), and
  * the Simpson's-paradox audit (is the pooled effect sign an artifact
  * of stratum mix?).
  *
  * Exactness discipline (the q207/q243 house rules): every cross-row
  * accumulation is an exact DECIMAL sum of DECIMAL(18,6)-cast inputs
  * (products bounded at DECIMAL(38,12) — no float sums anywhere, so
  * results are partitioning-invariant); θ, means, lifts close with a
  * fixed double expression tree over the exact sums. CUPED's adjusted
  * means use the algebraic identity
  *
  *   mean(y − θ(x − x̄) | arm) = ȳ_arm − θ·(x̄_arm − x̄)
  *
  * so the adjustment never materializes per-row doubles; the variance
  * reduction is corr²(x,y) by the same identity (var(y−θx) with
  * θ = cov/var(x) is var(y)·(1−ρ²)).
  *
  * Scale shape: everything is one map-side-combined aggregate over the
  * per-unit table (itself typically one groupBy over the event log) —
  * arm/stratum cardinality output, no shuffle beyond the group keys. */
object Experiments {

  private def dec(c: Column): Column = c.cast("decimal(18,6)")
  private def dsum(c: Column): Column = sum(c).cast("decimal(38,12)")

  /** Per arm: (arm, n_units, mean_x, mean_y, adj_mean_y, theta,
    * var_reduction) — `theta`/`var_reduction` are pooled constants
    * repeated on each row so the table is self-contained. `xCol` is
    * the pre-period covariate, `yCol` the experiment metric; NULL
    * x or y rows are excluded loudly upstream of the math (a unit
    * without a pre-period belongs in `coalesce(x, 0)` BEFORE calling —
    * zero is a statement, NULL is a bug). */
  def cupedLift(perUnit: DataFrame, xCol: String, yCol: String,
                armCol: String): DataFrame = {
    // one guard pass: NULL audit + covariate-degeneracy check.
    // countDistinct(x) > 1 ⟺ varXN ≠ 0 under the exact decimal
    // accumulation below, so a constant covariate (e.g. coalesce(x,0)
    // when NO unit has a pre-period) fails HERE with a pointed message
    // instead of as an ANSI DIVIDE_BY_ZERO deep in the theta plan
    val chk = perUnit.agg(
      coalesce(sum(when(col(xCol).isNull || col(yCol).isNull ||
        col(armCol).isNull, 1L)), lit(0L)).as("__bad"),
      countDistinct(col(xCol)).as("__nx")).head()
    require(chk.getLong(0) == 0,
      s"cupedLift: ${chk.getLong(0)} rows have NULL $xCol/$yCol/$armCol — " +
        "coalesce explicitly before calling (zero is a statement, NULL is a bug)")
    require(chk.getLong(1) > 1,
      s"cupedLift: covariate $xCol is constant across units — theta is " +
        "undefined (zero variance); CUPED cannot adjust on it, use the " +
        "plain arm means instead")
    val u = perUnit.select(col(armCol).as("arm"),
      dec(col(xCol)).as("__x"), dec(col(yCol)).as("__y"))
    val tot = u.agg(count(lit(1)).as("n"),
      dsum(col("__x")).as("sx"), dsum(col("__y")).as("sy"),
      dsum(col("__x") * col("__y")).as("sxy"),
      dsum(col("__x") * col("__x")).as("sxx"),
      dsum(col("__y") * col("__y")).as("syy"))
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val th = tot.select(col("n"), col("sx"),
      (covN / varXN).as("theta"),
      (covN * covN / (varXN * varYN)).as("var_reduction"))
    val arms = u.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_units"),
        dsum(col("__x")).as("ax"), dsum(col("__y")).as("ay"))
    arms.crossJoin(broadcast(th))
      .select(col("arm"), col("n_units"),
        (col("ax").cast("double") / col("n_units")).as("mean_x"),
        (col("ay").cast("double") / col("n_units")).as("mean_y"),
        (col("ay").cast("double") / col("n_units")
          - col("theta") * (col("ax").cast("double") / col("n_units")
            - col("sx").cast("double") / col("n"))).as("adj_mean_y"),
        col("theta"), col("var_reduction"))
      .orderBy(col("arm"))
  }

  /** Difference-in-differences over (unit, group, period, value):
    * one row — per-cell exact means and the DiD estimate
    * (treated_post − treated_pre) − (control_post − control_pre).
    * `treatedCol`/`postCol` are boolean-castable. */
  def diffInDiff(df: DataFrame, valueCol: String, treatedCol: String,
                 postCol: String): DataFrame = {
    val cells = df
      .filter(col(valueCol).isNotNull && col(treatedCol).isNotNull &&
        col(postCol).isNotNull)
      .groupBy(col(treatedCol).cast("boolean").as("__t"),
        col(postCol).cast("boolean").as("__p"))
      .agg(count(lit(1)).as("__n"), dsum(dec(col(valueCol))).as("__s"))
    val shape = cells.count()
    require(shape == 4, s"diffInDiff needs all 4 (treated, post) cells; got $shape")
    def m(t: Boolean, p: Boolean): Column =
      max(when(col("__t") === t && col("__p") === p,
        col("__s").cast("double") / col("__n")))
    def n(t: Boolean, p: Boolean): Column =
      max(when(col("__t") === t && col("__p") === p, col("__n")))
    cells.agg(
      n(true, false).as("n_treat_pre"), n(true, true).as("n_treat_post"),
      n(false, false).as("n_ctrl_pre"), n(false, true).as("n_ctrl_post"),
      m(true, false).as("treat_pre"), m(true, true).as("treat_post"),
      m(false, false).as("ctrl_pre"), m(false, true).as("ctrl_post"))
      .withColumn("did",
        (col("treat_post") - col("treat_pre"))
          - (col("ctrl_post") - col("ctrl_pre")))
  }

  /** Stratified average-treatment-effect over covariate quantile
    * strata — the observational-data adjustment the A/B pair
    * (cupedLift randomized, diffInDiff parallel-trends) was missing:
    * when assignment correlates with an observed covariate, the naive
    * arm difference is confounded; stratifying on the covariate's
    * quantile bins and mix-weighting the per-stratum differences is
    * propensity-score SUBCLASSIFICATION with the covariate as the
    * score (Rosenbaum & Rubin 1984, the five-subclass practice).
    *
    * Exactness: stratum edges are EXACT order statistics of the
    * integer covariate ([[ExactQuantile.globalRanks]] — the q233
    * two-phase machinery, no sampling); per-stratum outcome sums are
    * exact decimals; the ATE folds stratum terms in stratum order
    * (sorted-struct fold — the q224 discipline, never an
    * order-unspecified SUM over doubles).
    *
    * `xCol` must be integral (micro-scale first — the ExactQuantile
    * house rule). Every stratum must contain both arms — a one-armed
    * stratum has no within-stratum contrast and fails LOUDLY (merge
    * strata or fix the design; silently dropping it would reweight
    * the estimand). One row per stratum: (stratum, n0, n1, mean0,
    * mean1, diff) + (ate, n) repeated. */
  def stratifiedAte(perUnit: DataFrame, xCol: String, armCol: String,
                    yCol: String, strata: Int = 5): DataFrame = {
    require(strata >= 2 && strata <= 100, s"bad strata=$strata")
    val u = perUnit
      .filter(col(xCol).isNotNull && col(armCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(armCol).cast("boolean").as("__a"), dec(col(yCol)).as("__y"))
      .localCheckpoint() // two passes: edges + cells
    val n = u.count()
    require(n >= strata, s"$n units cannot fill $strata strata")
    val edges = ExactQuantile.globalRanks(u, "__x",
        (1 until strata).map(k => (k * n + strata - 1) / strata), lowBits = 8)
      .collect().map(_.getLong(1)).sorted // ≤ strata−1 values, bounded
    val stratum = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("__x") > e, 1).otherwise(0)
    }
    val cells = u.groupBy(stratum.as("stratum"))
      .agg(
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n0"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("n1"),
        dsum(when(!col("__a"), col("__y"))).as("__s0"),
        dsum(when(col("__a"), col("__y"))).as("__s1"))
    val bad = cells.filter(col("n0") === 0 || col("n1") === 0).count()
    require(bad == 0,
      s"stratifiedAte: $bad strata contain one arm only — no " +
        "within-stratum contrast; merge strata or fix the design")
    val per = cells
      .withColumn("mean0", col("__s0").cast("double") / col("n0"))
      .withColumn("mean1", col("__s1").cast("double") / col("n1"))
      .withColumn("diff", col("mean1") - col("mean0"))
    val ate = per.agg(aggregate(
        transform(array_sort(collect_list(struct(col("stratum"),
          ((col("n0") + col("n1")).cast("double") * col("diff")).as("w")))),
          s => s.getField("w")),
        lit(0.0), (acc, x) => acc + x).as("__num"))
      .select((col("__num") / n).as("ate"))
    per.crossJoin(broadcast(ate))
      .select(col("stratum"), col("n0"), col("n1"),
        col("mean0"), col("mean1"), col("diff"), col("ate"),
        lit(n).as("n"))
      .orderBy(col("stratum"))
  }

  /** Sample-ratio-mismatch audit — the FIRST check any A/B readout
    * must pass (Fabijan et al. 2019: a majority of real experiment
    * "wins" with SRM are assignment bugs, not effects): per experiment
    * the two arm counts vs the intended 50/50, with the 1-dof χ²
    * collapsing EXACTLY to (n₀−n₁)²/(n₀+n₁) — one division of exact
    * BIGINTs, so the flag is engine- and partitioning-invariant. The
    * 10.83 threshold is χ²₁ at p=0.001, the published practice (SRM
    * must be tested stringently because it invalidates everything
    * downstream). One map-side-combined aggregate. */
  def srmAudit(df: DataFrame, expCol: String, armCol: String,
               threshold: Double = 10.83): DataFrame = {
    val cells = df.filter(col(armCol).isNotNull)
      .groupBy(col(expCol).as("exp"))
      .agg(sum(when(!col(armCol).cast("boolean"), 1L).otherwise(0L)).as("n0"),
        sum(when(col(armCol).cast("boolean"), 1L).otherwise(0L)).as("n1"))
    cells.select(col("exp"), col("n0"), col("n1"),
        round(((col("n0") - col("n1")) * (col("n0") - col("n1")))
          .cast("double") / (col("n0") + col("n1")), 6).as("chi2"),
        (((col("n0") - col("n1")) * (col("n0") - col("n1"))).cast("double") /
          (col("n0") + col("n1")) > threshold).as("srm"))
      .orderBy(col("exp"))
  }

  /** Two-proportion z-test — the closing significance read on a binary
    * metric after [[srmAudit]] clears: pooled-variance z from four
    * exact counts, one fixed double tree (the textbook
    * (p̂₁−p̂₀)/√(p̂(1−p̂)(1/n₀+1/n₁))). One row; one aggregate. */
  def twoProportionZ(df: DataFrame, armCol: String,
                     successCol: String): DataFrame = {
    val c = df.filter(col(armCol).isNotNull && col(successCol).isNotNull)
      .agg(
        sum(when(!col(armCol).cast("boolean"), 1L).otherwise(0L)).as("n0"),
        sum(when(col(armCol).cast("boolean"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col(armCol).cast("boolean") &&
          col(successCol).cast("boolean"), 1L).otherwise(0L)).as("x0"),
        sum(when(col(armCol).cast("boolean") &&
          col(successCol).cast("boolean"), 1L).otherwise(0L)).as("x1"))
    val shape = c.head()
    require(shape.getLong(0) > 0 && shape.getLong(1) > 0,
      "twoProportionZ needs both arms populated")
    val xs = shape.getLong(2) + shape.getLong(3)
    val ns = shape.getLong(0) + shape.getLong(1)
    require(xs > 0 && xs < ns,
      s"twoProportionZ: pooled success rate is ${if (xs == 0) 0 else 1} " +
        "exactly — the pooled variance is zero and z is undefined; the " +
        "arms carry no comparable signal")
    val pooled = (col("x0") + col("x1")).cast("double") /
      (col("n0") + col("n1"))
    c.select(col("n0"), col("n1"), col("x0"), col("x1"),
      (col("x0").cast("double") / col("n0")).as("rate0"),
      (col("x1").cast("double") / col("n1")).as("rate1"),
      ((col("x1").cast("double") / col("n1") -
        col("x0").cast("double") / col("n0")) /
        sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1")))).as("z"))
  }

  /** Simpson's-paradox audit: per stratum the two arms' exact success
    * rates and rate difference, plus the POOLED difference repeated on
    * each row and a `reversed` flag (stratum effect sign opposes the
    * pooled sign) — the one-query answer to "is the aggregate lift an
    * artifact of stratum mix?". `successCol` boolean-castable. */
  def simpsonAudit(df: DataFrame, stratumCol: String, armCol: String,
                   successCol: String): DataFrame = {
    val base = df.filter(col(armCol).isNotNull && col(successCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        col(armCol).cast("boolean").as("__a"),
        when(col(successCol).cast("boolean"), 1L).otherwise(0L).as("__s"))
    def rate(a: Boolean): Column =
      sum(when(col("__a") === a, col("__s"))).cast("double") /
        sum(when(col("__a") === a, 1L)).cast("double")
    def cnt(a: Boolean): Column = sum(when(col("__a") === a, 1L))
    val strata = base.groupBy(col("stratum"))
      .agg(cnt(false).as("n0"), cnt(true).as("n1"),
        rate(false).as("rate0"), rate(true).as("rate1"))
      .withColumn("diff", col("rate1") - col("rate0"))
    val pooled = base.groupBy()
      .agg((rate(true) - rate(false)).as("pooled_diff"))
    strata.crossJoin(broadcast(pooled))
      .withColumn("reversed",
        col("diff").isNotNull &&
          ((col("diff") > 0 && col("pooled_diff") < 0) ||
           (col("diff") < 0 && col("pooled_diff") > 0)))
      .orderBy(col("stratum"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test — the inferential
    * closure of the Simpson audit above: pooling strata can FLIP an
    * effect (simpsonAudit flags it); CMH asks whether a COMMON
    * arm→outcome association exists after conditioning on the strata,
    * and the Mantel–Haenszel estimator gives the pooled odds ratio
    * that is valid even when stratum sizes differ wildly (Mantel &
    * Haenszel 1959; Agresti, Categorical Data Analysis §6.3):
    *
    *   CMH  = (Σₖ (aₖ − E[aₖ]))² / Σₖ Var(aₖ)
    *   E[aₖ]   = r1ₖ·c1ₖ/nₖ
    *   Var(aₖ) = r1ₖ·r2ₖ·c1ₖ·c2ₖ / (nₖ²·(nₖ−1))
    *   OR_MH = Σₖ(aₖdₖ/nₖ) / Σₖ(bₖcₖ/nₖ)
    *
    * Exactness: the 2×2×K cells are one map-side-combined BIGINT
    * aggregate; E, Var and the OR terms are rationals folded in
    * STRATUM ORDER via the sorted-list fold (the q279 discipline — the
    * doubles never see a partitioning-dependent order). Output: one
    * row per stratum (stratum, n, a, b, c, d, or_stratum) with the
    * pooled (cmh_chi2, or_mh) repeated — per-stratum attribution plus
    * the scalar verdict, the psiFromCells shape.
    *
    * Scale shape: ONE aggregate onto the ≤K strata grid; everything
    * after runs on K rows. Degenerate margins (a zero row/column in
    * every stratum) fail loudly rather than emitting 0/0. */
  def cmh(df: DataFrame, stratumCol: String, armCol: String,
          outcomeCol: String): DataFrame = {
    // ONE corpus pass: the strata cells pin (≤K rows) — the require,
    // the folds, and the final select otherwise each re-derive the
    // census; the K-row result re-emits driver-side (pin released)
    val spark = df.sparkSession
    Pinned.withCheckpoint(df
      .filter(col(stratumCol).isNotNull && col(armCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(col(armCol) === 1 && col(outcomeCol), 1L)
          .otherwise(0L)).as("a"),
        sum(when(col(armCol) === 1 && !col(outcomeCol), 1L)
          .otherwise(0L)).as("b"),
        sum(when(col(armCol) =!= 1 && col(outcomeCol), 1L)
          .otherwise(0L)).as("c"),
        sum(when(col(armCol) =!= 1 && !col(outcomeCol), 1L)
          .otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .filter(col("n") >= 2)
    ) { cells =>
    val terms = cells.select(col("stratum"), col("n"),
      col("a"), col("b"), col("c"), col("d"),
      (col("a").cast("double") -
        (col("a") + col("b")).cast("double") *
          (col("a") + col("c")).cast("double") /
          col("n").cast("double")).as("__dev"),
      ((col("a") + col("b")).cast("double") *
        (col("c") + col("d")).cast("double") *
        (col("a") + col("c")).cast("double") *
        (col("b") + col("d")).cast("double") /
        (col("n").cast("double") * col("n").cast("double") *
          (col("n") - 1).cast("double"))).as("__var"),
      (col("a").cast("double") * col("d").cast("double") /
        col("n").cast("double")).as("__ad"),
      (col("b").cast("double") * col("c").cast("double") /
        col("n").cast("double")).as("__bc"))
    def foldSorted(v: String) = aggregate(
      transform(array_sort(collect_list(struct(
        col("stratum").cast("string").as("k"), col(v).as("v")))),
        s => s.getField("v")),
      lit(0.0), (acc, x) => acc + x)
    val pooled = terms.agg(
      foldSorted("__dev").as("__sdev"), foldSorted("__var").as("__svar"),
      foldSorted("__ad").as("__sad"), foldSorted("__bc").as("__sbc"))
    val pooledRow = pooled.head()
    val svar = pooledRow.getDouble(1)
    require(svar > 0.0,
      "cmh: zero pooled variance — a margin is empty in every stratum")
    val out = terms.crossJoin(broadcast(pooled))
      .select(col("stratum"), col("n"), col("a"), col("b"), col("c"),
        col("d"),
        when(col("b") * col("c") > 0,
          round(col("a").cast("double") * col("d").cast("double") /
            (col("b").cast("double") * col("c").cast("double")), 6))
          .as("or_stratum"),
        round(col("__sdev") * col("__sdev") / col("__svar"), 6)
          .as("cmh_chi2"),
        when(col("__sbc") > 0, round(col("__sad") / col("__sbc"), 6))
          .as("or_mh"))
      .orderBy(col("stratum"))
    Grids.collectBounded(out, "cmh strata grid")
    }
  }

  /** McNemar's test for PAIRED classifier comparison — the test the
    * model layer (q263 stump, q264 Naive Bayes, q276 pipeline) needs
    * to say "model B is actually better than model A": on the SAME
    * items, accuracy deltas are driven entirely by the DISCORDANT
    * pairs (items one model gets right and the other wrong); the
    * concordant mass is noise-free and must not dilute the test
    * (McNemar 1947; Edwards' continuity correction):
    *
    *   χ² = (|n₁₀ − n₀₁| − 1)² / (n₁₀ + n₀₁)     (1 df)
    *
    * Input: one row per item with aCorrectCol/bCorrectCol booleans.
    * Exactness: the 2×2 census is one map-side-combined BIGINT
    * aggregate; the statistic is a single double close, 6-dp. A zero
    * discordant count fails loudly (the test is undefined — the
    * models are identical on this data). */
  def mcnemar(df: DataFrame, aCorrectCol: String,
              bCorrectCol: String): DataFrame = {
    val a = col(aCorrectCol).cast("boolean")
    val b = col(bCorrectCol).cast("boolean")
    val cells = df.filter(a.isNotNull && b.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
        sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("neither"))
    val r = cells.head()
    require(r.getLong(2) + r.getLong(3) > 0,
      "mcnemar: no discordant pairs — the classifiers agree everywhere")
    cells.select(col("n"), col("n_both"), col("a_only"), col("b_only"),
      col("neither"),
      round((abs(col("a_only") - col("b_only")).cast("double") - 1.0) *
        (abs(col("a_only") - col("b_only")).cast("double") - 1.0) /
        (col("a_only") + col("b_only")).cast("double"), 6).as("chi2_cc"))
  }

  /** Minimum detectable effect per experiment — the "is this test even
    * worth running" calculator every experiment platform front-loads
    * (and the honest companion to q274's z-test: a non-significant
    * readout means nothing if the MDE was 10× the plausible effect).
    * Two-proportion form at significance α and power 1−β:
    *
    *   MDE = (z_{1−α/2} + z_{power}) · √(p̄(1−p̄)(1/n₀ + 1/n₁))
    *
    * (Cohen 1988 §6 — the pooled-variance approximation). The z
    * constants enter PINNED (defaults are α = .05 / power = .8:
    * 1.959963984540054 and 0.8416212335729143) — never a runtime
    * inverse CDF, which engines would disagree on.
    *
    * Exactness: arm counts are one BIGINT census; the MDE closes in a
    * fixed double tree, 6-dp. One row per experiment: (experiment, n0,
    * n1, successes, pooled_rate, mde_abs, mde_rel). */
  def mdePower(df: DataFrame, expCol: String, armCol: String,
               successCol: String,
               zAlpha: Double = 1.959963984540054,
               zPower: Double = 0.8416212335729143): DataFrame = {
    require(zAlpha > 0 && zPower > 0, "bad z constants")
    val a = col(armCol).cast("int"); val y = col(successCol).cast("boolean")
    df.filter(col(expCol).isNotNull && a.isNotNull && y.isNotNull)
      .groupBy(col(expCol).as("experiment"))
      .agg(sum(when(a === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(a =!= 0, 1L).otherwise(0L)).as("n1"),
        sum(when(y, 1L).otherwise(0L)).as("successes"))
      .filter(col("n0") > 0 && col("n1") > 0 &&
        col("successes") > 0 && col("successes") < col("n0") + col("n1"))
      .withColumn("pooled_rate",
        col("successes").cast("double") /
          (col("n0") + col("n1")).cast("double"))
      .select(col("experiment"), col("n0"), col("n1"), col("successes"),
        round(col("pooled_rate"), 6).as("pooled_rate"),
        round(lit(zAlpha + zPower) *
          sqrt(col("pooled_rate") * (lit(1.0) - col("pooled_rate")) *
            (lit(1.0) / col("n0").cast("double") +
              lit(1.0) / col("n1").cast("double"))), 6).as("mde_abs"),
        round(lit(zAlpha + zPower) *
          sqrt(col("pooled_rate") * (lit(1.0) - col("pooled_rate")) *
            (lit(1.0) / col("n0").cast("double") +
              lit(1.0) / col("n1").cast("double"))) /
          col("pooled_rate"), 6).as("mde_rel"))
      .orderBy(col("experiment"))
  }

  /** Standardized effect size per experiment — the MAGNITUDE companion
    * to the z-test (significance) and [[mdePower]] (sensitivity): at
    * corpus-scale n, everything is "significant"; Cohen's d says
    * whether the effect is worth anything, and Hedges' g corrects d's
    * small-sample bias (Cohen 1988; Hedges 1981):
    *
    *   d = (x̄₁ − x̄₀) / s_pooled,   g = d·(1 − 3/(4N − 9))
    *
    * Exactness: per-arm Σy and Σy² accumulate as exact decimals of
    * DECIMAL(18,6) casts (one census); means, the pooled SD and both
    * effect sizes close in a fixed double tree, 6-dp. Degenerate
    * experiments (an empty arm, zero pooled variance) are excluded —
    * an effect size against zero spread is not a number anyone should
    * ship. One row per experiment: (experiment, n0, n1, mean0, mean1,
    * pooled_sd, cohens_d, hedges_g). */
  def effectSize(df: DataFrame, expCol: String, armCol: String,
                 yCol: String): DataFrame = {
    val a = col(armCol).cast("int")
    val cells = df.filter(col(expCol).isNotNull && a.isNotNull &&
        col(yCol).isNotNull)
      .groupBy(col(expCol).as("experiment"))
      .agg(
        sum(when(a === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(a =!= 0, 1L).otherwise(0L)).as("n1"),
        sum(when(a === 0, dec(col(yCol)))).cast("decimal(38,12)").as("s0"),
        sum(when(a =!= 0, dec(col(yCol)))).cast("decimal(38,12)").as("s1"),
        sum(when(a === 0, dec(col(yCol)) * dec(col(yCol))))
          .cast("decimal(38,12)").as("ss0"),
        sum(when(a =!= 0, dec(col(yCol)) * dec(col(yCol))))
          .cast("decimal(38,12)").as("ss1"))
      .filter(col("n0") >= 2 && col("n1") >= 2)
    val m0 = col("s0").cast("double") / col("n0").cast("double")
    val m1 = col("s1").cast("double") / col("n1").cast("double")
    // pooled variance from exact sums: ((ss0 − n0·m0²) + (ss1 − n1·m1²))
    //   / (n0 + n1 − 2)
    val sp2 = ((col("ss0").cast("double") -
      col("n0").cast("double") * m0 * m0) +
      (col("ss1").cast("double") - col("n1").cast("double") * m1 * m1)) /
      (col("n0") + col("n1") - 2).cast("double")
    val d = (m1 - m0) / sqrt(sp2)
    val g = d * (lit(1.0) - lit(3.0) /
      (lit(4.0) * (col("n0") + col("n1")).cast("double") - lit(9.0)))
    cells
      .filter(sp2 > 0)
      .select(col("experiment"), col("n0"), col("n1"),
        round(m0, 6).as("mean0"), round(m1, 6).as("mean1"),
        round(sqrt(sp2), 6).as("pooled_sd"),
        round(d, 6).as("cohens_d"), round(g, 6).as("hedges_g"))
      .orderBy(col("experiment"))
  }

  /** Cochran's Q — [[mcnemar]] for k PAIRED binary classifiers (Cochran
    * 1950): did ANY of the k heuristics/models disagree in accuracy on
    * the SAME documents, before k² pairwise McNemar tests. With
    * per-classifier success totals G_j and per-document success counts
    * L_i over complete cases:
    *
    *   Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣL_i − ΣL_i²),  df = k−1
    *
    * Exactness: G_j, ΣL, ΣL² are exact BIGINTs off ONE map-side-combined
    * pass (L_i is a row expression, never a per-document grid); Q is one
    * exact-integer ratio closed in BigDecimal-free doubles, 6-dp.
    * Documents with ANY NULL outcome drop (complete-case — the mcnemar
    * discipline); an all-concordant panel (zero denominator) refuses
    * loudly. Output: one row per classifier (classifier, successes)
    * with (n, k, q, df) repeated — the psiFromCells shape. */
  def cochranQ(df: DataFrame, outcomeCols: Seq[String]): DataFrame = {
    require(outcomeCols.size >= 2, s"cochranQ needs >= 2 classifiers")
    val k = outcomeCols.size
    val cols0 = outcomeCols.map(c => col(c).cast("boolean"))
    val complete = cols0.map(_.isNotNull).reduce(_ && _)
    val li = cols0.map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    val aggs = outcomeCols.map(c =>
      sum(when(col(c).cast("boolean"), 1L).otherwise(0L)).as(s"__g_$c")) ++
      Seq(count(lit(1)).as("__n"), sum(li).as("__sl"),
        sum(li * li).as("__sll"))
    val r = df.filter(complete).agg(aggs.head, aggs.tail: _*).head()
    val g = outcomeCols.indices.map(i => r.getLong(i))
    val n = r.getLong(k); val sl = r.getLong(k + 1); val sll = r.getLong(k + 2)
    require(n > 0, "cochranQ: no complete cases")
    val den = k.toLong * sl - sll
    require(den > 0,
      "cochranQ: zero denominator — every document is all-correct or " +
        "all-wrong across the panel")
    val sg = g.sum
    val sgg = g.map(x => BigInt(x) * BigInt(x)).sum
    val num = BigInt(k - 1) * (BigInt(k) * sgg - BigInt(sg) * BigInt(sg))
    val q = num.toDouble / den.toDouble
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = outcomeCols.zip(g).sortBy(_._1).map { case (c, gj) =>
      org.apache.spark.sql.Row(c, gj, n, k.toLong, q, (k - 1).toLong)
    }
    // round through the ENGINE's round (the house compare-the-rounded
    // rule) — a driver-side BigDecimal would use the exact binary
    // expansion where both engines' round() uses the decimal repr
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("classifier",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("successes",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("q",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("df",
        org.apache.spark.sql.types.LongType))))
      .select(col("classifier"), col("successes"), col("n"), col("k"),
        round(col("q"), 6).as("q"), col("df"))
      .orderBy(col("classifier"))
  }

  /** Friedman test (Friedman 1937) — [[cochranQ]] for GRADED paired
    * outcomes: k scoring systems measured on the same n blocks
    * (documents, queries), ranked WITHIN each block, omnibus "do the
    * systems differ in typical rank" before pairwise comparisons. The
    * tie-general form (Conover 1999 §5.2), all in DOUBLED midranks so
    * every intermediate is an exact BIGINT:
    *
    *   2r_ij = 2·#{l: v_il < v_ij} + #{l≠j: v_il = v_ij} + 2
    *   χ²_F = (k−1)·Σ_j (2R_j − n(k+1))² / (Σ(2r)² − n·k(k+1)²)
    *
    * Exactness: the doubled midrank is a pure row expression (k² CASE
    * comparisons, codegen'd — never a per-block shuffle); sums are one
    * map-side-combined BIGINT aggregate; the χ² ratio closes in
    * BigInt→double, 6-dp via the engine's round. Blocks with ANY NULL
    * score drop (complete-case, the mcnemar discipline); an
    * all-tied-blocks panel (zero denominator) refuses loudly.
    * Integer-scaled scores only. Output: one row per system
    * (system, rank_sum, mean_rank) with (n, k, chi2_f, df) repeated —
    * the psiFromCells shape. */
  def friedman(df: DataFrame, scoreCols: Seq[String]): DataFrame = {
    require(scoreCols.size >= 2, "friedman needs >= 2 score columns")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    scoreCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"friedman: score '$c' is $dt — integer-scaled only")
    }
    val k = scoreCols.size
    val vs = scoreCols.map(c => col(c).cast("long"))
    val complete = vs.map(_.isNotNull).reduce(_ && _)
    def r2(j: Int): Column = {
      val below = vs.indices.filter(_ != j)
        .map(l => when(vs(l) < vs(j), 1L).otherwise(0L))
        .reduce(_ + _)
      val ties = vs.indices.filter(_ != j)
        .map(l => when(vs(l) === vs(j), 1L).otherwise(0L))
        .reduce(_ + _)
      lit(2L) * below + ties + 2L
    }
    val aggs = scoreCols.indices.map(j =>
      sum(r2(j)).as(s"__r2_$j")) ++
      Seq(count(lit(1)).as("__n"),
        sum(scoreCols.indices.map(j => r2(j) * r2(j)).reduce(_ + _))
          .as("__s4"))
    val r = df.filter(complete).agg(aggs.head, aggs.tail: _*).head()
    val r2s = scoreCols.indices.map(i => r.getLong(i))
    val n = r.getLong(k); val s4 = r.getLong(k + 1)
    require(n > 0, "friedman: no complete cases")
    val den = BigInt(s4) - BigInt(n) * k * (k + 1) * (k + 1)
    require(den > 0,
      "friedman: zero rank variance — every block is fully tied " +
        "across the panel")
    val num = BigInt(k - 1) * r2s
      .map(x => { val d = BigInt(x) - BigInt(n) * (k + 1); d * d }).sum
    val chi2 = num.toDouble / den.toDouble
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = scoreCols.zip(r2s).sortBy(_._1).map { case (c, rj) =>
      org.apache.spark.sql.Row(c, rj.toDouble / 2.0,
        rj.toDouble / (2.0 * n.toDouble), n, k.toLong, chi2,
        (k - 1).toLong)
    }
    import org.apache.spark.sql.types.{StructType, StructField,
      StringType, DoubleType}
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("system", StringType),
      StructField("rank_sum", DoubleType),
      StructField("mean_rank", DoubleType),
      StructField("n", LongType),
      StructField("k", LongType),
      StructField("chi2_f", DoubleType),
      StructField("df", LongType))))
      .select(col("system"), col("rank_sum"),
        round(col("mean_rank"), 6).as("mean_rank"), col("n"), col("k"),
        round(col("chi2_f"), 6).as("chi2_f"), col("df"))
      .orderBy(col("system"))
  }

  /** Page's trend test (Page 1963) — [[friedman]] with a DIRECTION:
    * when the k systems have a hypothesized ORDER (curriculum stages,
    * increasing model sizes, dose levels), the ordered alternative
    * L = Σ_j j·R_j is far more powerful than the omnibus. `scoreCols`
    * order IS the hypothesis (ascending expected rank). Normal
    * approximation
    *
    *   E[L] = n·k(k+1)²/4,   Var[L] = n·k²(k+1)(k²−1)/144
    *
    * (ties make it mildly conservative — the standard caveat, noted
    * here because the doubled-midrank L is still EXACT: 2L = Σ j·2R_j
    * is a BIGINT; only the moments assume no ties). Complete-case,
    * integer-scaled scores, the [[friedman]] machinery. Output: one
    * row per system (system, rank_sum) with (n, k, l, z) repeated. */
  def pageTrend(df: DataFrame, scoreCols: Seq[String]): DataFrame = {
    require(scoreCols.size >= 3, "pageTrend needs >= 3 ordered systems")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    scoreCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"pageTrend: score '$c' is $dt — integer-scaled only")
    }
    val k = scoreCols.size
    val vs = scoreCols.map(c => col(c).cast("long"))
    val complete = vs.map(_.isNotNull).reduce(_ && _)
    def r2(j: Int): Column = {
      val below = vs.indices.filter(_ != j)
        .map(l => when(vs(l) < vs(j), 1L).otherwise(0L))
        .reduce(_ + _)
      val ties = vs.indices.filter(_ != j)
        .map(l => when(vs(l) === vs(j), 1L).otherwise(0L))
        .reduce(_ + _)
      lit(2L) * below + ties + 2L
    }
    val aggs = scoreCols.indices.map(j => sum(r2(j)).as(s"__r2_$j")) :+
      count(lit(1)).as("__n")
    val r = df.filter(complete).agg(aggs.head, aggs.tail: _*).head()
    val r2s = scoreCols.indices.map(i => r.getLong(i))
    val n = r.getLong(k)
    require(n > 0, "pageTrend: no complete cases")
    // 2L exact; L in halves only when some block is tied
    val l2 = r2s.zipWithIndex.map { case (x, j) =>
      BigInt(j + 1) * x }.sum
    val lVal = l2.toDouble / 2.0
    val eL = n.toDouble * k * (k + 1) * (k + 1) / 4.0
    val varL = n.toDouble * k * k * (k + 1) * (k * k - 1) / 144.0
    val z = (lVal - eL) / math.sqrt(varL)
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField,
      StringType, DoubleType}
    val rows = scoreCols.zipWithIndex.map { case (c, j) =>
      org.apache.spark.sql.Row(j.toLong + 1, c,
        r2s(j).toDouble / 2.0, n, k.toLong, lVal, z)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("position", LongType),
      StructField("system", StringType),
      StructField("rank_sum", DoubleType),
      StructField("n", LongType),
      StructField("k", LongType),
      StructField("l", DoubleType),
      StructField("z", DoubleType))))
      .select(col("position"), col("system"), col("rank_sum"), col("n"),
        col("k"), col("l"), round(col("z"), 6).as("z"))
      .orderBy(col("position"))
  }

  /** Group-sequential interim-analysis audit with O'Brien–Fleming
    * boundaries (O'Brien & Fleming 1979; Pocock 1977 frames the
    * family) — the CLASSICAL fixed-looks answer to peeking, beside
    * q312's anytime-valid mSPRT: K scheduled looks, look k compares
    * the cumulative two-proportion z (the q274 tree) against the
    * spending boundary b_k = c·√(K/k) — early looks need
    * overwhelming evidence, the final look spends almost the full α
    * (c ≈ 2.0401 for K = 5, two-sided α = 0.05; pass the published
    * constant for other designs).
    *
    * Exactness: cumulative (n, x) per (look, arm) are exact BIGINTs
    * off ONE corpus census; z and b_k close in doubles from those
    * integers with the identical IEEE tree in both engines (√(K/k) is
    * a correctly-rounded sqrt of an exact quotient); the crossing flag
    * compares the unrounded pair, so it cannot flip across engines.
    *
    * Output: one row per look (look, n0, n1, x0, x1, rate0, rate1, z,
    * boundary, crossed). Looks with a degenerate cumulative state
    * (an empty arm, pooled rate exactly 0 or 1) refuse loudly — a
    * schedule that looks before both arms have data is a design bug.
    *
    * Scale shape: one map-side-combined census keyed (look, arm); the
    * cumulative window and the close run on the ≤K-row grid. */
  def groupSequential(df: DataFrame, armCol: String, successCol: String,
                      lookCol: String, looks: Int,
                      cAlpha: Double = 2.0401): DataFrame = {
    require(looks >= 2 && looks <= 64, s"groupSequential: looks=$looks")
    require(cAlpha > 0, s"groupSequential: cAlpha=$cAlpha")
    val grid = df
      .filter(col(armCol).isNotNull && col(successCol).isNotNull &&
        col(lookCol).isNotNull)
      .groupBy(col(lookCol).cast("long").as("look"))
      .agg(
        sum(when(!col(armCol).cast("boolean"), 1L).otherwise(0L))
          .as("__n0"),
        sum(when(col(armCol).cast("boolean"), 1L).otherwise(0L))
          .as("__n1"),
        sum(when(!col(armCol).cast("boolean") &&
          col(successCol).cast("boolean"), 1L).otherwise(0L)).as("__x0"),
        sum(when(col(armCol).cast("boolean") &&
          col(successCol).cast("boolean"), 1L).otherwise(0L)).as("__x1"))
    val w = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("n0", sum(col("__n0")).over(w))
      .withColumn("n1", sum(col("__n1")).over(w))
      .withColumn("x0", sum(col("__x0")).over(w))
      .withColumn("x1", sum(col("__x1")).over(w))
    val cells = Grids.collectBounded(
      cum.select(col("look"), col("n0"), col("n1"), col("x0"), col("x1"))
        .orderBy(col("look")), "groupSequential look grid",
      maxRows = 64)
    val bad = cells.collect().find { r =>
      val (n0, n1) = (r.getLong(1), r.getLong(2))
      val xs = r.getLong(3) + r.getLong(4)
      n0 == 0 || n1 == 0 || xs == 0 || xs == n0 + n1
    }
    require(bad.isEmpty,
      s"groupSequential: degenerate cumulative state at look " +
        s"${bad.map(_.getLong(0)).getOrElse(-1L)} (empty arm or pooled " +
        "rate 0/1) — fix the look schedule")
    val lkBad = cells.filter(col("look") < 1 || col("look") > looks)
      .count()
    require(lkBad == 0,
      s"groupSequential: $lkBad looks outside [1, $looks]")
    val pooled = (col("x0") + col("x1")).cast("double") /
      (col("n0") + col("n1"))
    val z = (col("x1").cast("double") / col("n1") -
      col("x0").cast("double") / col("n0")) /
      sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val boundary = lit(cAlpha) *
      sqrt(lit(looks.toDouble) / col("look").cast("double"))
    cells
      .withColumn("__z", z).withColumn("__b", boundary)
      .select(col("look"), col("n0"), col("n1"), col("x0"), col("x1"),
        round(col("x0").cast("double") / col("n0"), 6).as("rate0"),
        round(col("x1").cast("double") / col("n1"), 6).as("rate1"),
        round(col("__z"), 6).as("z"), round(col("__b"), 6).as("boundary"),
        (abs(col("__z")) > col("__b")).as("crossed"))
      .orderBy(col("look"))
  }

  /** Yuen's trimmed-means t-test (Yuen 1974) — the LOCATION test for
    * heavy-tailed metrics that keeps the value scale q318's
    * Mann–Whitney throws away: trim the outer `trimNum/trimDen` of
    * each arm, compare trimmed means with winsorized variances and
    * Welch df:
    *
    *   t = (t̄₁ − t̄₀) / √(d₀ + d₁),
    *   d_g = (n_g−1)·s²_{w,g} / (h_g(h_g−1)),  h_g = n_g − 2k_g
    *
    * Exactness: everything before the close is exact integers off ONE
    * (arm, value) census — the trim bounds L/U are type-1 order
    * statistics from the per-arm cumulative (the q326 idiom), the
    * winsorized sums Σc·clamp(v) / Σc·clamp(v)² accumulate in
    * DECIMAL(38,0), and the trimmed sum counts each census cell's
    * overlap with positions [k+1, n−k]. t and df close in doubles from
    * those integers, 6-dp. Integer-scaled values only; arms 0/1.
    *
    * Scale shape: one map-side-combined census keyed (arm, value);
    * per-arm cumulative windows run on the value grid; the close is a
    * 2-row collect. */
  def yuen(df: DataFrame, armCol: String, valueCol: String,
           trimNum: Int = 1, trimDen: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"yuen: valueCol '$valueCol' is $vt — integer-scaled only")
    require(trimNum > 0 && trimDen > 0 && trimNum * 2 < trimDen,
      s"yuen: trim $trimNum/$trimDen outside (0, 1/2)")
    val rows = df.select(col(armCol).cast("int").as("__g"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    require(rows.filter(col("__g") =!= 0 && col("__g") =!= 1).isEmpty,
      "yuen: armCol must be 0/1")
    val spark = df.sparkSession
    Pinned.withCheckpoint(rows.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    ) { cells =>
      val wg = Window.partitionBy(col("__g")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells.withColumn("__cum", sum(col("__c")).over(wg))
      val perG = cum.groupBy(col("__g")).agg(max(col("__cum")).as("__n"))
        .withColumn("__k", // integer floor division (Spark `/` is double)
          expr(s"__n * $trimNum div $trimDen"))
      val withBounds = cum.join(perG, "__g")
      val bounds = withBounds
        .groupBy(col("__g"), col("__n"), col("__k"))
        .agg(min(when(col("__cum") >= col("__k") + 1, col("__v")))
            .as("__lo"),
          min(when(col("__cum") >= col("__n") - col("__k"), col("__v")))
            .as("__hi"))
      val stats = cum.join(bounds, "__g")
        .withColumn("__cl",
          least(greatest(col("__v"), col("__lo")), col("__hi")))
        .withColumn("__mid",
          greatest(lit(0L),
            least(col("__cum"), col("__n") - col("__k")) -
              greatest(col("__cum") - col("__c") + 1L, col("__k") + 1L) +
              1L))
        .groupBy(col("__g"), col("__n"), col("__k"))
        .agg(
          sum(col("__c").cast("decimal(38,0)") * col("__cl")).as("__sw"),
          sum(col("__c").cast("decimal(38,0)") * col("__cl") *
            col("__cl")).as("__sww"),
          sum(col("__mid").cast("decimal(38,0)") * col("__v"))
            .as("__ts"))
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getLong(2), BigDecimal(r.getDecimal(3)),
            BigDecimal(r.getDecimal(4)), BigDecimal(r.getDecimal(5))))
        .toMap
      require(stats.contains(0) && stats.contains(1),
        "yuen: both arms must be present")
      def arm(g: Int): (Long, Long, Double, Double) = {
        val (n, k, sw, sww, ts) = stats(g)
        val h = n - 2 * k
        require(h >= 2 && n >= 3,
          s"yuen: arm $g too small after trimming (n=$n, h=$h)")
        val tm = ts.toDouble / h.toDouble
        // s²_w = (n·Σc² − (Σc)²) / (n(n−1)) from exact integers
        val s2w = (BigDecimal(n) * sww - sw * sw).toDouble /
          (n.toDouble * (n - 1).toDouble)
        val d = (n - 1).toDouble * s2w / (h.toDouble * (h - 1).toDouble)
        (n, h, tm, d)
      }
      val (n0, h0, tm0, d0) = arm(0)
      val (n1, h1, tm1, d1) = arm(1)
      require(d0 + d1 > 0.0, "yuen: zero winsorized variance in both arms")
      val tStat = (tm1 - tm0) / math.sqrt(d0 + d1)
      val dfW = (d0 + d1) * (d0 + d1) /
        (d0 * d0 / (h0 - 1).toDouble + d1 * d1 / (h1 - 1).toDouble)
      spark.range(1).select(lit(n0).as("n0"), lit(n1).as("n1"),
        lit(h0).as("h0"), lit(h1).as("h1"),
        round(lit(tm0), 6).as("tmean0"), round(lit(tm1), 6).as("tmean1"),
        round(lit(tm1 - tm0), 6).as("diff"),
        round(lit(tStat), 6).as("t"), round(lit(dfW), 6).as("df_welch"))
    }
  }
}
