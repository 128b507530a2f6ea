package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-free trend inference over a time-grid series — the
  * robust complement to q173's least-squares slope (one outlier day
  * can own an OLS fit; these two can't be budged by < n/2 corruptions):
  *
  *  - [[mannKendall]]: the rank-correlation trend TEST (Mann 1945,
  *    Kendall 1975) — S = Σ_{i<j} sign(v_j − v_i) with the
  *    tie-corrected normal approximation; the "is this feed actually
  *    drifting or am I reading noise" gate.
  *  - [[theilSen]]: the median-of-pairwise-slopes ESTIMATOR (Theil
  *    1950, Sen 1968) — how fast it drifts, with breakdown point 29%.
  *
  * Exactness: grid values enter as exact DECIMAL comparisons (sign
  * and ties are integer-exact, so S and the tie table are
  * partitioning-invariant BIGINTs); var(S)'s /18 and the closing
  * z = (S∓1)/√var are one fixed double tree. Each pairwise slope is
  * ONE IEEE division of exact deltas; the median is an exact-rank
  * selection over slopes (ties resolved by value equality — a median
  * VALUE, not an unstable index), with even-count middles averaged,
  * matching ANSI `median` semantics.
  *
  * Scale shape: the series is CALENDAR-bounded (the Seasonal/
  * QuantileNorm grid contract — hours of observed span, not corpus
  * rows), so the pair table is grid², shuffled once as an equi-free
  * range join; the corpus appears only in the one map-side-combined
  * aggregate that builds the grid. The Theil–Sen median runs the
  * [[ExactQuantile]] two-phase shape keyed on ⌊slope·2²⁰⌋ — no global
  * sort, no single-partition window over pairs (a year of hours is
  * 38M pairs; the grid histogram stays ≤ distinct-prekey rows). */
object TrendTests {

  private def grid(df: DataFrame, tCol: String, vCol: String): DataFrame =
    df.select(col(tCol).cast("long").as("t"),
        col(vCol).cast("decimal(38,6)").as("v"))
      .filter(col("t").isNotNull && col("v").isNotNull)

  /** One row: (n, s, n_tie_groups, tie_adj, var_s, z). Input rows are
    * one value per grid position (duplicate t is a contract violation
    * — aggregate first, loudly checked). */
  def mannKendall(df: DataFrame, tCol: String, vCol: String): DataFrame = {
    val g = grid(df, tCol, vCol)
    val dup = g.groupBy(col("t")).count().filter(col("count") > 1).count()
    require(dup == 0, s"mannKendall: $dup grid positions have multiple rows " +
      "— aggregate to one value per position first")
    // renamed projections per side, not as("a")/as("b"): self-joining
    // one plan (especially a checkpointed one) can collapse attribute
    // ids and make b.t − a.t read 0 (measured: the q253 DIVIDE_BY_ZERO)
    val (ga, gb) = (g.select(col("t").as("ta"), col("v").as("va")),
      g.select(col("t").as("tb"), col("v").as("vb")))
    val pairs = ga.join(gb, col("ta") < col("tb"))
    val s = pairs.agg(sum(signum(
      (col("vb") - col("va")).cast("double")).cast("long")).as("s"))
    val ties = g.groupBy(col("v")).agg(count(lit(1)).as("tg"))
      .filter(col("tg") > 1)
      .agg(count(lit(1)).as("n_tie_groups"),
        coalesce(sum(col("tg") * (col("tg") - 1) * (col("tg") * 2 + 5)),
          lit(0L)).as("tie_adj"))
    val n = g.agg(count(lit(1)).as("n"))
    n.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_adj"))
          .cast("double") / 18.0)
      .withColumn("z",
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("var_s")))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
  }

  /** One row: (n, n_pairs, slope, intercept) — slope the exact-rank
    * median of pairwise slopes, intercept the median of
    * (v_i − slope·t_i) over the grid. */
  def theilSen(df: DataFrame, tCol: String, vCol: String): DataFrame = {
    val spark = df.sparkSession
    // grid-bounded; reused 3×; tracked release (see [[Pinned]])
    val pinnedG = Pinned.checkpoint(grid(df, tCol, vCol))
    val g = pinnedG.df
    try {
    val n = g.count()
    require(n >= 2, s"theilSen needs >= 2 grid rows, got $n")
    // renamed projections per side — see mannKendall's self-join note
    val (ga, gb) = (g.select(col("t").as("ta"), col("v").as("va")),
      g.select(col("t").as("tb"), col("v").as("vb")))
    // the when() guard is semantically identity (the join admits only
    // tb > ta) but REQUIRED: the fused BNLJ+aggregate codegen
    // speculatively evaluates this projection on not-yet-filtered
    // pairs, and ANSI double division throws on the ta == tb ones
    // (measured: q253 DIVIDE_BY_ZERO with zero matched-pair zeros)
    val slopes = ga.join(gb, col("ta") < col("tb"))
      .select(when(col("tb") > col("ta"),
        (col("vb") - col("va")).cast("double") /
          (col("tb") - col("ta")).cast("double")).as("slope"))
    val p = n * (n - 1) / 2
    val slope = medianByTwoPhase(slopes, "slope", p)
    val intercepts = g.select(
      (col("v").cast("double") - lit(slope) * col("t").cast("double"))
        .as("ic"))
    // the intercept population is the GRID (≤ calendar rows) — the
    // unpartitioned window is the Seasonal-style bounded idiom here
    val wi = Window.orderBy(col("ic"))
    val r1i = (n + 1) / 2; val r2i = n / 2 + 1
    val ic = intercepts.withColumn("__r", row_number().over(wi))
      .filter(col("__r") === r1i || col("__r") === r2i)
      .agg(avg(col("ic"))).head().getDouble(0)
    spark.range(1).select(lit(n).as("n"), lit(p).as("n_pairs"),
      lit(slope).as("slope"), lit(ic).as("intercept"))
    // result is literal-only — the pinned grid must not outlive the call
    } finally pinnedG.release()
  }

  /** Exact median over a double column of known count `p` without a
    * global sort: phase 1 histograms ⌊v·2²⁰⌋ prekeys (monotone in v;
    * collisions only widen phase 2), phase 2 ranks DISTINCT values
    * within the located prekey bucket(s) — the [[ExactQuantile]]
    * construction lifted to doubles. Even counts average the two
    * middle values (ANSI `median`).
    *
    * CONTRACT — grid-bounded inputs only. The phase-1 cumulative-rank
    * window is deliberately UNPARTITIONED (one task sees the whole
    * prekey histogram): that is sound because every caller here feeds
    * values derived from a calendar/quantile GRID (≤ grid² pairwise
    * slopes ⇒ ≤ a few hundred thousand distinct prekeys), not corpus
    * rows. A corpus-scale caller would funnel its whole histogram
    * through one partition — the loud `require` below refuses that
    * regime instead of silently serializing it; such a caller should
    * bucket the cumsum by high bits first (the [[ExactQuantile]]
    * construction). */
  /** Seasonal Mann–Kendall (Hirsch & Slack 1984, independent-seasons
    * form) — the trend test [[mannKendall]] gets WRONG on a cycled
    * series: a flat series with a daily cycle feeds MK thousands of
    * cross-phase pairs whose sign is pure seasonality. Here pairs are
    * confined WITHIN each season (hour-of-day, month), then
    *
    *   S = Σ_g S_g,   Var = Σ_g [n_g(n_g−1)(2n_g+5) − Σ_t t(t−1)(2t+5)]/18
    *
    * with the continuity-corrected z on the total. Output: one row per
    * season (season, n, s, var_s) with (s_total, z) repeated — the
    * psiFromCells shape (the per-season rows show WHICH phase carries
    * the trend).
    *
    * Exactness: S_g and tie sums are exact BIGINTs (pairwise sign over
    * exact decimals); var closes /18 in doubles per season, z from the
    * integer total. One value per (season, t) position required.
    *
    * Scale shape: the input must already BE a grid (the [[mannKendall]]
    * contract); the pair join is season-keyed (Σ n_g² pairs, an
    * equi-join on season — never the unkeyed n² cross), ties one census;
    * the per-season close re-emits through the [[Grids]] guard. */
  def seasonalMannKendall(df: DataFrame, tCol: String, vCol: String,
                          seasonCol: String): DataFrame = {
    val g0 = df.select(col(seasonCol).cast("long").as("g"),
        col(tCol).cast("long").as("t"),
        col(vCol).cast("decimal(38,6)").as("v"))
      .filter(col("g").isNotNull && col("t").isNotNull &&
        col("v").isNotNull)
    Pinned.withCheckpoint(g0) { g =>
      val dup = g.groupBy(col("g"), col("t")).count()
        .filter(col("count") > 1).count()
      require(dup == 0, s"seasonalMannKendall: $dup (season, t) positions " +
        "have multiple rows — aggregate to one value per position first")
      val (ga, gb) = (g.select(col("g").as("gg"), col("t").as("ta"),
        col("v").as("va")),
        g.select(col("g").as("gb2"), col("t").as("tb"), col("v").as("vb")))
      val sG = ga.join(gb, col("gg") === col("gb2") &&
          col("ta") < col("tb"))
        .groupBy(col("gg").as("g"))
        .agg(sum(signum((col("vb") - col("va")).cast("double"))
          .cast("long")).as("s"))
      val tiesG = g.groupBy(col("g"), col("v"))
        .agg(count(lit(1)).as("tg")).filter(col("tg") > 1)
        .groupBy(col("g"))
        .agg(sum(col("tg") * (col("tg") - 1) * (col("tg") * 2 + 5))
          .as("tie_adj"))
      val perG = g.groupBy(col("g")).agg(count(lit(1)).as("n"))
        .join(sG, Seq("g"), "left")
        .join(tiesG, Seq("g"), "left")
        .select(col("g"), col("n"), coalesce(col("s"), lit(0L)).as("s"),
          (((col("n") * (col("n") - 1) * (col("n") * 2 + 5)) -
            coalesce(col("tie_adj"), lit(0L))).cast("double") / 18.0)
            .as("var_s"))
      val cells = Grids.collectBounded(perG.orderBy(col("g")),
        "seasonalMannKendall season grid")
      val rows = cells.collect()
      val sTot = rows.map(_.getAs[Long]("s")).sum
      val varTot = rows.map(_.getAs[Double]("var_s")).sum
      require(varTot > 0.0, "seasonalMannKendall: zero variance — " +
        "every season is constant or single-valued")
      val z =
        if (sTot > 0) (sTot - 1).toDouble / math.sqrt(varTot)
        else if (sTot < 0) (sTot + 1).toDouble / math.sqrt(varTot)
        else 0.0
      cells.select(col("g").as("season"), col("n"), col("s"),
          round(col("var_s"), 6).as("var_s"),
          lit(sTot).as("s_total"), round(lit(z), 6).as("z"))
        .orderBy(col("season"))
    }
  }

  /** Wald–Wolfowitz runs test about the grid median — the RANDOMNESS
    * audit under the trend family: [[mannKendall]] asks "is there a
    * monotone trend", this asks "is the sequence even exchangeable"
    * (too FEW runs = clustering/regime persistence, too MANY =
    * oscillation), the standard residual-independence check after a
    * fit (q173/q306). Signs are taken against the exact lower median
    * of the grid values (a type-1 order statistic off the value
    * census); median-tied positions drop (the dichotomy must be
    * strict); then
    *
    *   R = 1 + Σ_t [s_t ≠ s_{t−1}],  μ = 2n₁n₂/(n₁+n₂) + 1,
    *   σ² = 2n₁n₂(2n₁n₂−n₁−n₂) / ((n₁+n₂)²(n₁+n₂−1))
    *
    * Exactness: median, run count, and n₁/n₂ are exact integers off
    * the pinned grid; μ, σ, z close in doubles from those integers
    * (identical IEEE expression tree in the oracle), 6-dp. Integer-
    * scaled values only. One row: (n, median, n_above, n_below, runs,
    * expected_runs, z).
    *
    * Scale shape: the input must already BE a grid (the Seasonal
    * idiom), loudly bounded at 2¹² positions; one pinned pass derives
    * it, census + sign-change window run on grid rows. */
  def runsTest(df: DataFrame, tCol: String, vCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(vCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"runsTest: valueCol '$vCol' is $vt — integer-scaled only")
    Pinned.withCheckpoint(df
      .select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    ) { g =>
      val spark = g.sparkSession
      val n = g.count()
      require(n >= 3 && n <= (1 << 12),
        s"runsTest: $n grid positions outside [3, 4096] — pre-aggregate " +
          "onto a bounded time grid first (the Seasonal idiom)")
      val wv = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = g.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(wv))
        .filter(col("__cum") * 2 >= n)
        .agg(min(col("__v"))).head().getLong(0)
      val wt = Window.orderBy(col("__t"))
      val signed = g.filter(col("__v") =!= med)
        .withColumn("__s", col("__v") > med)
        .withColumn("__chg",
          when(lag(col("__s"), 1).over(wt).isNull, 1L)
            .when(lag(col("__s"), 1).over(wt) =!= col("__s"), 1L)
            .otherwise(0L))
      val r = signed.agg(
        sum(when(col("__s"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__s"), 0L).otherwise(1L)).as("n2"),
        sum(col("__chg")).as("runs")).head()
      // a constant series leaves NOTHING off the median: empty sums
      val (n1, n2, runs) =
        if (r.isNullAt(0)) (0L, 0L, 0L)
        else (r.getLong(0), r.getLong(1), r.getLong(2))
      require(n1 > 0 && n2 > 0,
        s"runsTest: degenerate dichotomy ($n1 above, $n2 below median)")
      val n1d = n1.toDouble; val n2d = n2.toDouble
      val nn = n1d + n2d
      val mu = 2.0 * n1d * n2d / nn + 1.0
      val varR = 2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d) /
        (nn * nn * (nn - 1.0))
      require(varR > 0.0, "runsTest: zero run variance")
      val z = (runs.toDouble - mu) / math.sqrt(varR)
      spark.range(1).select(lit(n).as("n"), lit(med).as("median"),
        lit(n1).as("n_above"), lit(n2).as("n_below"),
        lit(runs).as("runs"), round(lit(mu), 6).as("expected_runs"),
        round(lit(z), 6).as("z"))
    }
  }

  private[operators] val MaxMedianHistBuckets: Long = 1L << 22
  private[operators] def medianByTwoPhase(vals: DataFrame, c: String, p: Long,
      maxBuckets: Long = MaxMedianHistBuckets): Double = {
    val r1 = (p + 1) / 2; val r2 = p / 2 + 1
    val keyed = vals.select(col(c).as("__v"),
      floor(col(c) * (1L << 20)).cast("long").as("__b"))
    // pinned: bounds the contract check AND saves one recompute of the
    // (possibly join-shaped) input between phase-1 ranking and lookup
    val pinnedH = Pinned.checkpoint(
      keyed.groupBy(col("__b")).agg(count(lit(1)).as("__c")))
    val hist = pinnedH.df
    try {
    val nb = hist.count()
    require(nb <= maxBuckets,
      s"medianByTwoPhase: $nb distinct prekey buckets exceeds the " +
        s"grid-bounded contract ($maxBuckets); the phase-1 " +
        "rank window is single-partition by design — bucket the input " +
        "by high bits (ExactQuantile-style) before taking its median")
    val wb = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__hi", sum(col("__c")).over(wb))
      .withColumn("__lo", col("__hi") - col("__c"))
    val buckets = cum
      .filter((lit(r1) > col("__lo") && lit(r1) <= col("__hi")) ||
        (lit(r2) > col("__lo") && lit(r2) <= col("__hi")))
      .select(col("__b"), col("__lo")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // ≤ 2 buckets
    val inB = buckets.keys.map(b => col("__b") === b).reduce(_ || _)
    val perVal = keyed.filter(inB)
      .groupBy(col("__b"), col("__v")).agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lodf = vals.sparkSession.createDataFrame(buckets.toSeq)
      .toDF("__b2", "__blo")
    val picked = perVal.withColumn("__vhi", sum(col("__c")).over(wv))
      .join(broadcast(lodf), col("__b") === col("__b2"))
      .withColumn("__ghi", col("__blo") + col("__vhi"))
      .withColumn("__glo", col("__ghi") - col("__c"))
      .filter((lit(r1) > col("__glo") && lit(r1) <= col("__ghi")) ||
        (lit(r2) > col("__glo") && lit(r2) <= col("__ghi")))
      .select(col("__v"),
        when(lit(r1) > col("__glo") && lit(r1) <= col("__ghi") &&
          lit(r2) > col("__glo") && lit(r2) <= col("__ghi"), 2L)
          .otherwise(1L).as("__w"))
      .collect()
    picked.map(r => r.getDouble(0) * r.getLong(1)).sum /
      picked.map(_.getLong(1)).sum
    } finally pinnedH.release()
  }

  /** Running-records trend test (Foster & Stuart 1954) — the
    * EXTREMES-sensitive trend read [[mannKendall]]'s pair census is
    * not: MK weighs every pair equally; the records test counts only
    * NEW MAXIMA, so a series whose body is flat while its peaks climb
    * (capacity-style degradation) lights up here first. Under
    * exchangeability the i-th observation is a record with probability
    * 1/i, independently: E[R] = H_n, Var[R] = H_n − H_n⁽²⁾,
    * z = (R − H_n)/√Var.
    *
    * Pinned tie rule: a record is a STRICT new maximum (a tie with
    * the running max is not a record) — the conservative choice for
    * integer data.
    *
    * Exactness: records come from one running-max window over the
    * bounded grid (exact integers); H_n and H_n⁽²⁾ fold 1/i and 1/i²
    * doubles through DECIMAL(38,12) ledgers (order-independent); one
    * closing tree. One row: (n, records, e_records, z_records). */
  def recordsTest(df: DataFrame, tCol: String, vCol: String): DataFrame = {
    val g = df.select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    val spark = df.sparkSession
    Pinned.withCheckpoint(g) { gg =>
      val n = gg.count()
      require(n >= 10 && n <= (1 << 16),
        s"recordsTest: $n grid positions outside [10, 65536]")
      val w = Window.orderBy(col("__t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val idx = Window.orderBy(col("__t"))
      val r = gg
        .withColumn("__i", row_number().over(idx).cast("long"))
        .withColumn("__pm", max(col("__v")).over(w))
        .agg(
          sum(when(col("__pm").isNull || col("__v") > col("__pm"), 1L)
            .otherwise(0L)).as("rec"),
          sum((lit(1.0) / col("__i").cast("double"))
            .cast("decimal(38,12)")).as("h1"),
          sum((lit(1.0) / (col("__i").cast("double") *
            col("__i").cast("double"))).cast("decimal(38,12)")).as("h2"))
        .head()
      val rec = r.getLong(0)
      val h1 = BigDecimal(r.getDecimal(1)).toDouble
      val h2 = BigDecimal(r.getDecimal(2)).toDouble
      val v = h1 - h2
      require(v > 0.0, "recordsTest: degenerate variance")
      val z = (rec.toDouble - h1) / math.sqrt(v)
      spark.range(1).select(lit(n).as("n"), lit(rec).as("records"),
        round(lit(h1), 6).as("e_records"),
        round(lit(z), 6).as("z_records"))
    }
  }

  /** Jonckheere–Terpstra ordered-alternative test (Jonckheere 1954;
    * Terpstra 1952) — [[cochranArmitage]] for VALUES: Kruskal–Wallis
    * (q319) spends k−1 df asking "do the tiers differ at all"; JT
    * spends one df on "do the values RISE with tier order", the
    * question an ordered factor actually poses. JT = Σ_{i<j} U_ij
    * (Mann–Whitney counts between every ordered tier pair, ties ½).
    *
    * The pair space never materializes: over the tiers×values grid,
    * 2·JT = Σ_{(s,v)} c·(2·P + Q) with P = Σ_{i<s} C_i(<v) and
    * Q = Σ_{i<s} c_i(v) — two nested cumsum windows (values within
    * tier, tiers within value), the chatterjee/wasserstein discipline.
    *
    * Exactness: 2·JT and 2·E[JT] = (N² − Σnᵢ²)/2 are exact integers;
    * the null variance uses the FULL Hollander–Wolfe tie correction
    * (§6.2: three terms from tier sizes nᵢ and tie multiplicities
    * t_u), every numerator an exact DECIMAL(38,0) sum, the close one
    * fixed double tree. One row: (k, n, jt2, e2, z).
    *
    * Scale shape: one (tier, value) census; the grid explodes to
    * tiers×values (loudly bounded: k ≤ 64, values ≤ 2²⁰ — wider
    * domains pre-bucket) and everything runs on grid windows. */
  def jonckheereTerpstra(df: DataFrame, scoreCol: String,
                         valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    Seq(scoreCol, valueCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"jonckheereTerpstra: '$c' is $dt — integer-scaled only")
    }
    val cells = df.filter(col(scoreCol).isNotNull && col(valueCol).isNotNull)
      .select(col(scoreCol).cast("long").as("__s"),
        col(valueCol).cast("long").as("__v"))
      .groupBy(col("__s"), col("__v")).agg(count(lit(1)).as("__c"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(cells) { cs =>
      val tiers = cs.select(col("__s")).distinct()
      val values = cs.select(col("__v")).distinct()
      val k = tiers.count(); val nv = values.count()
      require(k >= 2 && k <= 64,
        s"jonckheereTerpstra: $k tiers outside [2, 64]")
      require(nv >= 2 && nv <= (1 << 20),
        s"jonckheereTerpstra: $nv distinct values outside [2, 2^20] — " +
          "pre-bucket the value column first")
      val d0 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val grid = tiers.crossJoin(values)
        .join(cs, Seq("__s", "__v"), "left")
        .withColumn("__c0", coalesce(col("__c"), lit(0L)))
      val wv = Window.partitionBy(col("__s")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ws = Window.partitionBy(col("__v")).orderBy(col("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = grid
        .withColumn("__cb", sum(col("__c0")).over(wv) - col("__c0"))
        .withColumn("__p", sum(col("__cb")).over(ws) - col("__cb"))
        .withColumn("__q", sum(col("__c0")).over(ws) - col("__c0"))
      val jt2 = BigDecimal(staged
        .agg(sum(d0(col("__c0")) * (lit(2) * col("__p") + col("__q"))))
        .head().getDecimal(0)).toLongExact
      // tier sizes and tie multiplicities feed E and the tie-corrected
      // variance (Hollander & Wolfe, Nonparametric Statistical Methods)
      val tierSums = cs.groupBy(col("__s")).agg(sum(col("__c")).as("__n"))
        .agg(sum(col("__n")).as("n"),
          sum(d0(col("__n")) * col("__n")).as("sn2"),
          sum(d0(col("__n")) * (col("__n") - 1) *
            (lit(2) * col("__n") + 5)).as("sn25"),
          sum(d0(col("__n")) * (col("__n") - 1) * (col("__n") - 2))
            .as("sn3"),
          sum(d0(col("__n")) * (col("__n") - 1)).as("snn")).head()
      val tieSums = cs.groupBy(col("__v")).agg(sum(col("__c")).as("__t"))
        .agg(sum(d0(col("__t")) * (col("__t") - 1) *
          (lit(2) * col("__t") + 5)).as("st25"),
          sum(d0(col("__t")) * (col("__t") - 1) * (col("__t") - 2))
            .as("st3"),
          sum(d0(col("__t")) * (col("__t") - 1)).as("stt")).head()
      val n = tierSums.getLong(0)
      val sn2 = BigDecimal(tierSums.getDecimal(1))
      val sn25 = BigDecimal(tierSums.getDecimal(2)).toDouble
      val sn3 = BigDecimal(tierSums.getDecimal(3)).toDouble
      val snn = BigDecimal(tierSums.getDecimal(4)).toDouble
      val st25 = BigDecimal(tieSums.getDecimal(0)).toDouble
      val st3 = BigDecimal(tieSums.getDecimal(1)).toDouble
      val stt = BigDecimal(tieSums.getDecimal(2)).toDouble
      val e2 = ((BigDecimal(n) * n - sn2) / 2).toLongExact
      val nd = n.toDouble
      val t1 = (nd * (nd - 1.0) * (2.0 * nd + 5.0) - sn25 - st25) / 72.0
      val t2 = sn3 * st3 / (36.0 * (nd * (nd - 1.0) * (nd - 2.0)))
      val t3 = snn * stt / (8.0 * (nd * (nd - 1.0)))
      val v = t1 + t2 + t3
      require(v > 0.0,
        "jonckheereTerpstra: zero null variance — a single tier or a " +
          "constant value column")
      val z = (jt2 - e2).toDouble / (2.0 * math.sqrt(v))
      spark.range(1).select(lit(k).as("k"), lit(n).as("n"),
        lit(jt2).as("jt2"), lit(e2).as("e2"),
        round(lit(z), 6).as("z_jt"))
    }
  }

  /** Cochran–Armitage trend-in-proportions test (Cochran 1954;
    * Armitage 1955) — the ORDERED alternative for binary rates that
    * the suite's omnibus tests throw power away on: χ² (q174) and the
    * k-proportion comparisons treat tiers as unordered labels, but
    * "does the conversion rate RISE with priority" is a one-degree
    * question, and CA spends its single df exactly on the ordered
    * slope:
    *
    *   Z = (Σsᵢxᵢ − p̄·Σsᵢnᵢ) / √(p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N))
    *
    * with integer tier scores sᵢ, tier totals nᵢ, successes xᵢ,
    * p̄ = X/N. Z ~ N(0,1) under no trend; its SIGN is the direction.
    *
    * Exactness: all five sufficient statistics are exact DECIMAL(38,0)
    * sums off the tier census (scores are integers by contract); the
    * close is one fixed double tree. One row: (k, n, pooled_rate,
    * z_ca). Scale shape: one map-side-combined census onto the tier
    * grid (metadata-bounded, 2¹⁰ cap). */
  def cochranArmitage(df: DataFrame, scoreCol: String,
                      yCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val st = df.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(st),
      s"cochranArmitage: scoreCol '$scoreCol' is $st — integer tier " +
        "scores only")
    val cells = df.filter(col(scoreCol).isNotNull && col(yCol).isNotNull)
      .select(col(scoreCol).cast("long").as("__s"),
        col(yCol).cast("boolean").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__x"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(cells) { cs =>
      val k = cs.count()
      require(k >= 2 && k <= (1 << 10),
        s"cochranArmitage: $k tiers outside [2, 1024]")
      val d0 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val r = cs.agg(sum(col("__n")).as("n"), sum(col("__x")).as("x"),
        sum(d0(col("__s")) * col("__x")).as("s1"),
        sum(d0(col("__s")) * col("__n")).as("s2"),
        sum(d0(d0(col("__s")) * col("__s")) * col("__n")).as("s3"))
        .head()
      val (n, x) = (r.getLong(0), r.getLong(1))
      require(x > 0 && x < n,
        s"cochranArmitage: degenerate outcome (x=$x of $n)")
      val Seq(s1, s2, s3) =
        (2 to 4).map(i => BigDecimal(r.getDecimal(i)).toDouble)
      val pbar = x.toDouble / n.toDouble
      val num = s1 - pbar * s2
      val v = pbar * (1.0 - pbar) * (s3 - s2 * s2 / n.toDouble)
      require(v > 0.0, "cochranArmitage: constant tier score")
      val z = num / math.sqrt(v)
      spark.range(1).select(lit(k).as("k"), lit(n).as("n"),
        round(lit(pbar), 6).as("pooled_rate"),
        round(lit(z), 6).as("z_ca"))
    }
  }
}
