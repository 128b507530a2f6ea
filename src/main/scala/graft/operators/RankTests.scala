package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann–Whitney rank-sum / ROC-AUC per group — the standard
  * label-separability check for a ranking signal (Mann & Whitney 1947;
  * AUC = U/(n₁·n₂) is its probabilistic reading: P(score⁺ > score⁻)
  * with ties at ½). A corpus curator runs this to validate that a
  * cheap score (length, LM surprisal, quality heuristic) actually
  * separates a labeled slice before using it as a filter — AUC ≈ 0.5
  * means the signal is noise for that group.
  *
  * Exactness (the Gini/KS idiom — no floating-point ranks): with min
  * ranks r(v) from RANK() and tie counts t(v), the tie-averaged rank of
  * a row at value v is r(v) + (t(v)−1)/2, so TWICE the positive-class
  * rank sum is the exact BIGINT
  *
  *   2·R₁ = Σ_{pos rows} (2·r(v) + t(v) − 1),   2·U₁ = 2·R₁ − n₁·(n₁+1)
  *
  * and AUC = 2·U₁ / (2·n₁·n₂) closes with one pinned double division
  * (NULL when a group has only one class). Bit-stable on any
  * partitioning, SQL-replayable.
  *
  * Scale shape: ONE `Exchange(group)` + per-partition sort feeds both
  * windows (same ordering), then a map-side-combined aggregate emits
  * one row per group. Groups must be plural-per-corpus (source, lang)
  * — a single global group would funnel one partition (the q86/q167
  * caveat; pre-shard and merge U statistics if you need corpus-global).
  */
object RankTests {

  /** Operating-point selection: per group, the DEEPEST score-ranked
    * prefix whose precision against a (weak) label stays ≥
    * pNum/pDen — "pick the quality-score cutoff that keeps 90%
    * precision, and tell me how much data that keeps". Exact rational
    * test (cum_pos·pDen ≥ rank·pNum — no float on the decision), rank
    * ordering deterministic via (score desc, id), one Exchange(group)
    * window + one aggregate. The operating point is RANK-based:
    * tied scores can split at the boundary, which is the standard
    * top-k selection semantics (document the tie id-ordering).
    * Groups with no feasible prefix report NULLs. */
  def precisionThreshold(df: DataFrame, groupCol: String, scoreCol: String,
                         label: Column, idCol: String,
                         pNum: Long, pDen: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same NULL-score exclusion as aucPerGroup
    df.filter(col(scoreCol).isNotNull)
      .withColumn("__pos", label)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cp", sum(when(col("__pos"), 1L).otherwise(0L)).over(wc))
      .groupBy(col(groupCol))
      .agg(max(when(col("__cp") * pDen >= col("__rn") * pNum,
        struct(col("__rn"), col(scoreCol).as("__s"), col("__cp")))).as("__best"))
      .select(col(groupCol),
        col("__best.__rn").as("best_rank"),
        col("__best.__s").as("thr_score"),
        col("__best.__cp").as("n_pos_kept"),
        (col("__best.__cp").cast("double") / col("__best.__rn").cast("double"))
          .as("prec"))
  }

  /** (groupCol, n_pos, n_neg, u2 = 2·U₁, auc) — `labelCol` must be a
    * boolean Column (the positive class). */
  def aucPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                  label: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    val wv = Window.partitionBy(col(groupCol), col(scoreCol))
    // NULL scores cannot be ranked and engines disagree on NULL sort
    // order: excluded by definition
    df.filter(col(scoreCol).isNotNull)
      .withColumn("__pos", label)
      .withColumn("__rk", rank().over(w).cast("long"))
      .withColumn("__tie", count(lit(1)).over(wv))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col("__pos"), lit(2L) * col("__rk") + col("__tie") - 1L)
          .otherwise(0L)).as("__r2"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("__n"))
      .withColumn("n_neg", col("__n") - col("n_pos"))
      .withColumn("u2", col("__r2") - col("n_pos") * (col("n_pos") + 1))
      .withColumn("auc",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .drop("__r2", "__n")
  }

  /** Mann–Whitney U rank-sum TEST (the inferential face of
    * [[aucPerGroup]]'s statistic): did treatment (group 1) shift the
    * metric's distribution against control (group 0), without the
    * normality assumption the t-family needs — the robust two-sample
    * readout for heavy-tailed metrics (latency, spend, doc length).
    * Normal approximation with the standard tie-corrected variance
    * (Mann & Whitney 1947; Lehmann 1975):
    *
    *   z = (U₁ − n₁n₂/2) / sqrt( n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))) )
    *
    * Exactness: the (value, group) census is one map-side-combined
    * BIGINT aggregate; 2·U₁ = Σ_v (2·n₁(v)·C₂(<v) + n₁(v)·n₂(v)) and
    * Σ(t³−t) are exact BIGINTs off a cumulative window on the value
    * grid; z closes in doubles from those integers. `valueCol` must be
    * integer-scaled (cents, chars, tokens — the levene contract).
    * Degenerate inputs (a one-value metric: zero variance) refuse
    * loudly. One row: (n1, n2, u1, u2, z).
    *
    * Scale shape: one census aggregate onto the distinct-value grid;
    * the cumulative window runs on the grid, never the corpus. */
  def mannWhitney(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"mannWhitney: valueCol '$valueCol' is $vt — integer-scaled only")
    val rows = df.select(col(groupCol).cast("int").as("__g"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val badGroup = rows.filter(col("__g") =!= 0 && col("__g") =!= 1)
    require(badGroup.isEmpty, "mannWhitney: groupCol must be 0/1")
    val spark = df.sparkSession
    // ONE corpus pass: the value-grid census pins; totals/ties/U read it
    Pinned.withCheckpoint(rows.groupBy(col("__v"))
      .agg(sum(when(col("__g") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__g") === 0, 1L).otherwise(0L)).as("__n2"))
    ) { grid =>
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = grid
        .withColumn("__cb2", sum(col("__n2")).over(w) - col("__n2"))
        .withColumn("__t", col("__n1") + col("__n2"))
      val p = terms.agg(
        sum(col("__n1")).as("n1"), sum(col("__n2")).as("n2"),
        sum(lit(2L) * col("__n1") * col("__cb2") +
          col("__n1") * col("__n2")).as("__u1x2"),
        sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__ties"),
        count(lit(1)).as("__grid")).head()
      val (n1, n2) = (p.getLong(0), p.getLong(1))
      require(n1 > 0 && n2 > 0, s"mannWhitney: empty group ($n1, $n2)")
      require(p.getLong(4) > 1, "mannWhitney: one-value metric — no ranks")
      val u1 = p.getLong(2).toDouble / 2.0
      val nn = (n1 + n2).toDouble
      val varU = n1.toDouble * n2.toDouble / 12.0 *
        ((nn + 1.0) - p.getLong(3).toDouble / (nn * (nn - 1.0)))
      require(varU > 0.0, "mannWhitney: zero rank variance")
      val z = (u1 - n1.toDouble * n2.toDouble / 2.0) / math.sqrt(varU)
      spark.range(1).select(lit(n1).as("n1"), lit(n2).as("n2"),
        lit(u1).as("u1"), lit(n1.toDouble * n2.toDouble - u1).as("u2"),
        round(lit(z), 6).as("z"))
    }
  }

  /** Cliff's delta (Cliff 1993) — the EFFECT SIZE the [[mannWhitney]]
    * z cannot be: at corpus scale everything is "significant"; δ =
    * P(x₁ > x₀) − P(x₁ < x₀) answers whether the shift is LARGE,
    * scale-free and robust (the ordinal counterpart of q311's
    * Cohen's d). Computed from the same exact value census:
    *
    *   gt = Σ_v n₁(v)·C₂(<v),  eq = Σ_v n₁(v)·n₂(v),
    *   lt = n₁·n₂ − gt − eq,   δ = (gt − lt)/(n₁·n₂)
    *
    * with the Romano et al. (2006) magnitude labels on |δ| (decided on
    * the 6-dp-rounded δ, so the label can't flip across engines).
    * Pair counts accumulate in DECIMAL(38,0) (gt ≤ n₁·n₂ ≈ 10²⁴ at
    * 10¹² rows) and publish as doubles (exact correctly-rounded
    * conversion in both engines). Integer-scaled values only.
    *
    * Scale shape: the [[mannWhitney]] shape — one census aggregate
    * onto the distinct-value grid, cumulative window on the grid. */
  def cliffsDelta(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"cliffsDelta: valueCol '$valueCol' is $vt — integer-scaled only")
    val rows = df.select(col(groupCol).cast("int").as("__g"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val badGroup = rows.filter(col("__g") =!= 0 && col("__g") =!= 1)
    require(badGroup.isEmpty, "cliffsDelta: groupCol must be 0/1")
    val spark = df.sparkSession
    Pinned.withCheckpoint(rows.groupBy(col("__v"))
      .agg(sum(when(col("__g") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__g") === 0, 1L).otherwise(0L)).as("__n2"))
    ) { grid =>
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = grid
        .withColumn("__cb2", sum(col("__n2")).over(w) - col("__n2"))
      val p = terms.agg(
        sum(col("__n1")).as("n1"), sum(col("__n2")).as("n2"),
        sum((col("__n1").cast("decimal(38,0)") * col("__cb2")))
          .as("__gt"),
        sum((col("__n1").cast("decimal(38,0)") * col("__n2")))
          .as("__eq")).head()
      val (n1, n2) = (p.getLong(0), p.getLong(1))
      require(n1 > 0 && n2 > 0, s"cliffsDelta: empty group ($n1, $n2)")
      val gt = BigDecimal(p.getDecimal(2))
      val eq = BigDecimal(p.getDecimal(3))
      val lt = BigDecimal(n1) * BigDecimal(n2) - gt - eq
      val delta = BigDecimal((gt - lt).toDouble /
        (n1.toDouble * n2.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val mag =
        if (math.abs(delta) < 0.147) "negligible"
        else if (math.abs(delta) < 0.33) "small"
        else if (math.abs(delta) < 0.474) "medium"
        else "large"
      spark.range(1).select(lit(n1).as("n1"), lit(n2).as("n2"),
        lit(gt.toDouble).as("gt_pairs"), lit(lt.toDouble).as("lt_pairs"),
        lit(eq.toDouble).as("tie_pairs"), lit(delta).as("delta"),
        lit(mag).as("magnitude"))
    }
  }

  /** Kruskal–Wallis H — [[mannWhitney]] for k groups (Kruskal & Wallis
    * 1952): one omnibus "did ANY slice shift the metric" readout before
    * k² pairwise tests, on the same exact value-census machinery.
    * With midranks m(v) = C(<v) + (t(v)+1)/2 (2·m(v) is an exact
    * BIGINT), per-group rank sums R_g = Σ_v n_g(v)·m(v):
    *
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1),
    *   H_corr = H / (1 − Σ(t³−t)/(N³−N))
    *
    * Output: one row per group (group, n, rank_sum) with (h,
    * h_corrected, df) repeated — per-slice attribution plus the scalar
    * verdict, the psiFromCells shape. Integer-scaled values only.
    *
    * Scale shape: one (group, value) census aggregate; the cumulative
    * window and folds run on the grid; the group-bounded result
    * re-emits driver-side through the [[Grids]] guard. */
  def kruskalWallis(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"kruskalWallis: valueCol '$valueCol' is $vt — integer-scaled only")
    val rows = df.select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    Pinned.withCheckpoint(rows.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    ) { cells =>
      val vgrid = cells.groupBy(col("__v")).agg(sum(col("__c")).as("__t"))
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = vgrid
        // 2·midrank = 2·C(<v) + t + 1, exact
        .withColumn("__m2",
          lit(2L) * (sum(col("__t")).over(w) - col("__t")) +
            col("__t") + 1L)
      val perG = cells.join(ranked.select(col("__v"), col("__m2")), "__v")
        .groupBy(col("__g"))
        .agg(sum(col("__c")).as("n"),
          sum(col("__c") * col("__m2")).as("__r2")) // exact 2·R_g
      val pooled = ranked.agg(sum(col("__t")).as("__nn"),
        sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__ties"),
        count(lit(1)).as("__grid")).head()
      val nn = pooled.getLong(0)
      require(nn >= 3, s"kruskalWallis: $nn rows")
      require(pooled.getLong(2) > 1, "kruskalWallis: one-value metric")
      val tieCorr = 1.0 - pooled.getLong(1).toDouble /
        (nn.toDouble * nn.toDouble * nn.toDouble - nn.toDouble)
      require(tieCorr > 0.0, "kruskalWallis: all values tied")
      // Σ R_g²/n_g folded in group order off the exact (2R_g)² / 4
      val sums = perG.agg(count(lit(1)).as("__k"),
        aggregate(
          transform(array_sort(collect_list(struct(col("__g"),
            col("__r2"), col("n")))),
            p => p.getField("__r2").cast("double") *
              p.getField("__r2").cast("double") / 4.0 /
              p.getField("n").cast("double")),
          lit(0.0), (acc, x) => acc + x).as("__s")).head()
      val k = sums.getLong(0)
      require(k >= 2, s"kruskalWallis: $k groups (need >= 2)")
      val h = 12.0 / (nn.toDouble * (nn + 1.0)) * sums.getDouble(1) -
        3.0 * (nn + 1.0)
      val out = perG
        .select(col("__g").as(groupCol), col("n"),
          (col("__r2").cast("double") / 2.0).as("rank_sum"),
          round(lit(h), 6).as("h"),
          round(lit(h / tieCorr), 6).as("h_corrected"),
          lit(k - 1).as("df"))
        .orderBy(col(groupCol))
      Grids.collectBounded(out, "kruskal group grid")
    }
  }
}
