package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — the
  * nonparametric "what fraction survives past t" curve under RIGHT
  * CENSORING, the estimator that makes duration data honest: averaging
  * observed durations ignores censored users (who survived AT LEAST
  * their observation) and biases lifetime low. Pairs with
  * [[ChurnLabels]]: that operator builds the (duration, event) rows,
  * this one turns them into the retention curve product/tenure teams
  * actually read.
  *
  * Estimator: at each distinct EVENT time t with n_t at risk and d_t
  * events, S(t) = Π_{u ≤ t} (1 − d_u/n_u). All counts are exact
  * integers off one duration-grid aggregate; each factor is one
  * correctly-rounded double division and the product folds the grid
  * prefix IN DURATION ORDER (sorted-struct fold — the fixed-fold-order
  * rule), so the curve replays bit-for-bit in any engine. Censored
  * rows leave the risk set after their time (standard KM: a tie
  * between an event and a censoring at t counts the censored row as
  * still at risk for t's factor).
  *
  * Scale shape: ONE map-side-combined (duration → d, c) aggregate over
  * the cohort; everything after runs on the DURATION GRID (day-grid
  * bounded — the QuantileNorm grid contract: tenure in days is
  * calendar-bounded, not cohort-bounded). The prefix-product join is
  * grid², documented and bounded by the same argument. */
object Survival {

  /** (t, n_risk, n_events, n_censored, surv) — one row per distinct
    * EVENT time, ascending; `surv` is S(t) AFTER t's events. */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val rows = df.select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("boolean").as("__e"))
      .filter(col("__t").isNotNull && col("__t") >= 0 && col("__e").isNotNull)
    val grid = rows.groupBy(col("__t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("__c"))
    val n = grid.agg(coalesce(sum(col("__d") + col("__c")), lit(0L)).as("__n"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid
      .crossJoin(broadcast(n))
      .withColumn("__gone", sum(col("__d") + col("__c")).over(w))
      // at risk AT t = everyone not yet gone BEFORE t
      .withColumn("n_risk", col("__n") - col("__gone") + col("__d") + col("__c"))
    // prefix product over the grid (grid² join — duration grids are
    // day-bounded); factors fold in duration order
    val g2 = atRisk.filter(col("__d") > 0)
      .select(col("__t").as("__u"), col("__d").as("__du"), col("n_risk").as("__nu"))
    atRisk.filter(col("__d") > 0).as("g")
      .join(g2, col("__u") <= col("__t"))
      .groupBy(col("__t"))
      .agg(first(col("n_risk")).as("n_risk"), first(col("__d")).as("n_events"),
        first(col("__c")).as("n_censored"),
        array_sort(collect_list(struct(col("__u"),
          ((col("__nu") - col("__du")).cast("double") / col("__nu").cast("double"))
            .as("__f")))).as("__ps"))
      .select(col("__t").as("t"), col("n_risk"), col("n_events"), col("n_censored"),
        aggregate(expr("transform(__ps, p -> p.__f)"), lit(1.0),
          (acc, f) => acc * f).as("surv"))
      .orderBy(col("t"))
  }

  /** Nelson–Aalen cumulative hazard — the ADDITIVE face of
    * [[kaplanMeier]]'s product curve: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ with
    * Aalen's variance Σ dᵢ/nᵢ². Where S(t) answers "what fraction
    * survives", H(t) reads hazard RATE structure directly — a straight
    * H(t) is constant hazard (exponential churn), a flattening H is
    * early-risk concentration, and slope changes localize exactly WHEN
    * the risk regime shifted (the curve a retention team reads for
    * "week-2 cliff" diagnostics). Near-linear-H vs KM-curvature
    * disagreement is also the standard small-sample sanity check:
    * −ln S(t) ≈ H(t), and a large gap flags heavy ties.
    *
    * Exactness: the duration grid, event and at-risk counts are exact
    * BIGINTs (the KM machinery); each dᵢ/nᵢ term evaluates once in
    * doubles and CUMULATES as DECIMAL(38,12) (order-independent,
    * engine-replayable — a double window-sum would expose the two
    * engines' different summation trees). One closing sqrt per row.
    *
    * Scale shape: one map-side-combined census onto the duration grid;
    * the cumsum window runs on grid rows (day-bounded). */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val rows = df.select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("boolean").as("__e"))
      .filter(col("__t").isNotNull && col("__t") >= 0 && col("__e").isNotNull)
    val grid = rows.groupBy(col("__t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("__c"))
    val n = grid.agg(coalesce(sum(col("__d") + col("__c")), lit(0L)).as("__n"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(n))
      .withColumn("__gone", sum(col("__d") + col("__c")).over(w))
      .withColumn("n_risk", col("__n") - col("__gone") + col("__d") + col("__c"))
      .filter(col("__d") > 0)
      .withColumn("__h", (col("__d").cast("double") /
        col("n_risk").cast("double")).cast("decimal(38,12)"))
      .withColumn("__v", (col("__d").cast("double") /
        (col("n_risk").cast("double") * col("n_risk").cast("double")))
        .cast("decimal(38,12)"))
      .withColumn("__ch", sum(col("__h")).over(w))
      .withColumn("__cv", sum(col("__v")).over(w))
      .select(col("__t").as("t"), col("n_risk"),
        col("__d").as("n_events"), col("__c").as("n_censored"),
        round(col("__ch").cast("double"), 6).as("na_cumhaz"),
        round(sqrt(col("__cv").cast("double")), 6).as("na_se"))
      .orderBy(col("t"))
  }

  /** Two-group log-rank test — the inferential companion to
    * [[kaplanMeier]]: two survival curves (control vs treatment, old
    * pipeline vs new) can LOOK different while the difference is
    * noise; log-rank is the standard test (Mantel 1966; the
    * hypergeometric form — Klein & Moeschberger §7.3). At each event
    * time t with n₁ₜ/n₀ₜ at risk and dₜ total events:
    *
    *   E₁ₜ = dₜ·n₁ₜ/nₜ
    *   Vₜ  = dₜ·(n₁ₜ/nₜ)(1−n₁ₜ/nₜ)(nₜ−dₜ)/(nₜ−1)
    *   χ²  = (Σₜ(d₁ₜ − E₁ₜ))² / ΣₜVₜ      (1 df)
    *
    * `groupCol` must be 0/1. Exactness: the per-(time, group) event/
    * censor census and the at-risk cumsums are exact BIGINTs on the
    * shared duration grid (a censoring in EITHER group moves the
    * other group's later risk sets — the grid is shared, never
    * per-group); E and V are rationals folded in TIME ORDER via the
    * sorted-list fold. Output: one row per event time (t, n_risk1,
    * n_risk0, d1, d0, e1) with (chi2) repeated — per-time attribution
    * plus the scalar verdict, the psiFromCells shape.
    *
    * Scale shape: ONE census aggregate onto the day-bounded duration
    * grid; cumsum windows and folds run on the grid only. */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              groupCol: String): DataFrame = {
    val rows = df.select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("boolean").as("__e"),
        col(groupCol).cast("int").as("__g"))
      .filter(col("__t").isNotNull && col("__t") >= 0 &&
        col("__e").isNotNull && col("__g").isNotNull)
    val badGroup = rows.filter(col("__g") =!= 0 && col("__g") =!= 1)
    require(badGroup.isEmpty, "logRank: groupCol must be 0/1")
    // ONE corpus pass: the duration-grid census pins — totals, risk
    // windows, the variance require and the final select otherwise
    // each re-scan; the grid-bounded result re-emits driver-side
    val spark = df.sparkSession
    Pinned.withCheckpoint(rows.groupBy(col("__t"))
      .agg(sum(when(col("__e") && col("__g") === 1, 1L).otherwise(0L))
          .as("__d1"),
        sum(when(!col("__e") && col("__g") === 1, 1L).otherwise(0L))
          .as("__c1"),
        sum(when(col("__e") && col("__g") === 0, 1L).otherwise(0L))
          .as("__d0"),
        sum(when(!col("__e") && col("__g") === 0, 1L).otherwise(0L))
          .as("__c0"))
    ) { grid =>
    val tots = grid.agg(sum(col("__d1") + col("__c1")).as("__n1tot"),
      sum(col("__d0") + col("__c0")).as("__n0tot"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid.crossJoin(broadcast(tots))
      .withColumn("__gone1", sum(col("__d1") + col("__c1")).over(w))
      .withColumn("__gone0", sum(col("__d0") + col("__c0")).over(w))
      .withColumn("n_risk1",
        col("__n1tot") - col("__gone1") + col("__d1") + col("__c1"))
      .withColumn("n_risk0",
        col("__n0tot") - col("__gone0") + col("__d0") + col("__c0"))
      .filter(col("__d1") + col("__d0") > 0)
      .withColumn("__nt", col("n_risk1") + col("n_risk0"))
      .withColumn("__dt", col("__d1") + col("__d0"))
      .withColumn("e1", col("__dt").cast("double") *
        col("n_risk1").cast("double") / col("__nt").cast("double"))
      .withColumn("__v",
        when(col("__nt") > 1,
          col("__dt").cast("double") *
            (col("n_risk1").cast("double") / col("__nt").cast("double")) *
            (lit(1.0) - col("n_risk1").cast("double") /
              col("__nt").cast("double")) *
            (col("__nt") - col("__dt")).cast("double") /
            (col("__nt") - 1).cast("double"))
          .otherwise(lit(0.0)))
    def foldSorted(v: org.apache.spark.sql.Column) = aggregate(
      transform(array_sort(collect_list(struct(col("__t"), v.as("v")))),
        p => p.getField("v")),
      lit(0.0), (acc, x) => acc + x)
    val pooled = atRisk.agg(
      foldSorted(col("__d1").cast("double") - col("e1")).as("__sdev"),
      foldSorted(col("__v")).as("__sv"))
    require(pooled.head().getDouble(1) > 0.0,
      "logRank: zero pooled variance — a group never shares a risk set")
    val out = atRisk.crossJoin(broadcast(pooled))
      .select(col("__t").as("t"), col("n_risk1"), col("n_risk0"),
        col("__d1").as("d1"), col("__d0").as("d0"),
        round(col("e1"), 6).as("e1"),
        round(col("__sdev") * col("__sdev") / col("__sv"), 6).as("chi2"))
      .orderBy(col("t"))
    Grids.collectBounded(out, "logRank duration grid")
    }
  }

  /** Restricted mean survival time + median — the SCALARS a dashboard
    * trends where [[kaplanMeier]] gives a curve: RMST(τ) = ∫₀^τ S(t)dt
    * is the average event-free time over the horizon (Royston &
    * Parmar 2013 — the standard KM summary when hazards are NOT
    * proportional and a single ratio would lie), and the median is
    * the first time S(t) drops to ≤ ½. Computed exactly from the
    * [[kaplanMeier]] step function:
    *
    *   RMST = min(t₁, τ) + Σᵢ S(tᵢ)·(min(tᵢ₊₁, τ) − min(tᵢ, τ))
    *
    * (the first term is the S = 1 stretch before the first event).
    * Determinism: interval terms fold in TIME ORDER via the
    * sorted-list fold over the day-bounded KM grid; the median picks
    * the smallest qualifying t by an exact min. One row:
    * (tau, rmst, median_t, n_times). */
  def rmst(df: DataFrame, durationCol: String, eventCol: String,
           tau: Long): DataFrame = {
    require(tau > 0, s"rmst: bad horizon tau=$tau")
    val km = kaplanMeier(df, durationCol, eventCol)
    val w = Window.orderBy(col("t")) // KM grid-bounded (day grid)
    val terms = km
      .withColumn("__next", coalesce(lead(col("t"), 1).over(w), lit(tau)))
      .withColumn("__seg",
        when(least(col("__next"), lit(tau)) > least(col("t"), lit(tau)),
          col("surv") * (least(col("__next"), lit(tau)) -
            least(col("t"), lit(tau))).cast("double"))
          .otherwise(lit(0.0)))
    val head = km.agg(min(col("t")).as("__t1"),
      count(lit(1)).as("n_times")).head()
    require(!head.isNullAt(0), "rmst: no event times")
    val t1 = head.getLong(0); val nTimes = head.getLong(1)
    val folded = terms.agg(
      aggregate(
        transform(array_sort(collect_list(struct(col("t"),
          col("__seg").as("v")))), p => p.getField("v")),
        lit(0.0), (acc, x) => acc + x).as("__area"),
      min(when(col("surv") <= 0.5, col("t"))).as("median_t"))
    folded.select(lit(tau).as("tau"),
      round(lit(math.min(t1, tau).toDouble) + col("__area"), 6)
        .as("rmst"),
      col("median_t"), lit(nTimes).as("n_times"))
  }
  /** Aalen–Johansen cumulative incidence under COMPETING RISKS — the
    * estimator [[kaplanMeier]] cannot be: with two ways to exit (churn
    * vs upgrade, error vs purchase), "1 − KM of cause 1 treating cause
    * 2 as censoring" overstates cause-1 incidence because a unit taken
    * by cause 2 was never going to contribute a cause-1 event later.
    * The AJ estimator allocates each event time's hazard to its cause
    * against the ALL-CAUSE survival just before it:
    *
    *   CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ⁻) · d_{k,i} / nᵢ
    *
    * with S the all-cause product-limit curve; CIF₁ + CIF₂ + S(t) = 1
    * at every step (the identity the naive per-cause KM breaks).
    *
    * `causeCol`: 0 = censored, 1 / 2 = the two competing causes.
    * Exactness: the (time, cause) census and shared risk sets are
    * exact BIGINTs; S(t⁻) folds factors in strict-time order (the KM
    * sorted-struct fold, strict inequality); each CIF term evaluates
    * once in doubles and cumulates as DECIMAL(38,12) (the nelsonAalen
    * replay pattern). Scale shape: one census onto the day-bounded
    * duration grid; the strict-prefix product join is grid², bounded
    * by the same calendar argument as KM. */
  def aalenJohansen(df: DataFrame, durationCol: String,
                    causeCol: String): DataFrame = {
    val rows = df.select(col(durationCol).cast("long").as("__t"),
        col(causeCol).cast("int").as("__k"))
      .filter(col("__t").isNotNull && col("__t") >= 0 && col("__k").isNotNull)
    val bad = rows.filter(!col("__k").isin(0, 1, 2)).count()
    require(bad == 0,
      s"aalenJohansen: $bad row(s) with cause outside {0 (censored), 1, 2}")
    val grid = rows.groupBy(col("__t"))
      .agg(sum(when(col("__k") === 1, 1L).otherwise(0L)).as("__d1"),
        sum(when(col("__k") === 2, 1L).otherwise(0L)).as("__d2"),
        sum(when(col("__k") === 0, 1L).otherwise(0L)).as("__c"))
    val n = grid.agg(coalesce(sum(col("__d1") + col("__d2") + col("__c")),
      lit(0L)).as("__n"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid.crossJoin(broadcast(n))
      .withColumn("__gone",
        sum(col("__d1") + col("__d2") + col("__c")).over(w))
      .withColumn("n_risk",
        col("__n") - col("__gone") + col("__d1") + col("__d2") + col("__c"))
    val evt = atRisk.filter(col("__d1") + col("__d2") > 0)
    val g2 = evt.select(col("__t").as("__u"),
      (col("__d1") + col("__d2")).as("__du"), col("n_risk").as("__nu"))
    // S(t-): strict-prefix product in time order (prepended 1.0 keeps
    // the first event time's factor list non-empty)
    val sMinus = evt.as("g")
      .join(g2, col("__u") < col("__t"), "left")
      .groupBy(col("__t"))
      .agg(first(col("n_risk")).as("n_risk"),
        first(col("__d1")).as("d1"), first(col("__d2")).as("d2"),
        array_sort(collect_list(when(col("__u").isNotNull,
          struct(col("__u"), ((col("__nu") - col("__du")).cast("double") /
            col("__nu").cast("double")).as("__f"))))).as("__ps"))
      .withColumn("__sminus",
        aggregate(expr("transform(__ps, p -> p.__f)"), lit(1.0),
          (acc, f) => acc * f))
    sMinus
      .withColumn("__term1", (col("__sminus") * col("d1").cast("double") /
        col("n_risk").cast("double")).cast("decimal(38,12)"))
      .withColumn("__term2", (col("__sminus") * col("d2").cast("double") /
        col("n_risk").cast("double")).cast("decimal(38,12)"))
      .withColumn("__cif1", sum(col("__term1")).over(w))
      .withColumn("__cif2", sum(col("__term2")).over(w))
      .select(col("__t").as("t"), col("n_risk"), col("d1"), col("d2"),
        round(col("__cif1").cast("double"), 6).as("cif1"),
        round(col("__cif2").cast("double"), 6).as("cif2"),
        round(col("__sminus") * (col("n_risk") - col("d1") - col("d2"))
          .cast("double") / col("n_risk").cast("double"), 6).as("km_all"))
      .orderBy(col("t"))
  }
}
