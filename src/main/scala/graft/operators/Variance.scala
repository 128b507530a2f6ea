package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Levene's test for variance homogeneity across groups — the
  * assumption check the per-group mean comparisons (q247/q259/q274)
  * silently lean on, and a drift signal in its own right: a source
  * whose document-length VARIANCE explodes while its mean holds is
  * mixing two populations (template pages + articles). Levene (1960,
  * mean-centered form): with z_gi = |x_gi − x̄_g|,
  *
  *   W = ((N−k)/(k−1)) · Σ_g n_g(z̄_g − z̄)² / Σ_gi(z_gi − z̄_g)²
  *
  * W ~ F(k−1, N−k) under homogeneity — large W means the spreads
  * differ.
  *
  * INTEGER-DOMAIN CONTRACT (the Inequality.gini house rule): x must
  * be integer-scaled (chars, tokens, cents) — then the group-scaled
  * deviations u_gi = |n_g·x_gi − S_g| are exact BIGINTs, Σu and Σu²
  * accumulate exactly (DECIMAL(38,0) for the squares — scale 0, so
  * neither engine ever rounds a product), every z-moment is an
  * exact-integer-over-integer close (z̄_g = Σu/n_g², Σz² = Σu²/n_g²),
  * and the between/within terms fold in GROUP ORDER via the
  * sorted-list fold. Output: one row per group (group, n, z_mean)
  * with (w, df1, df2) repeated.
  *
  * Scale shape: two corpus passes (group sums; deviation sums), both
  * map-side combined onto the groups grid; the test closes on k rows.
  * The group-sums join broadcasts (groups are plural-per-corpus, the
  * q167 contract). */
object Variance {

  def levene(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"levene: valueCol '$valueCol' is $vt — values must be integer-" +
        "scaled (chars, tokens, cents); scale fractional metrics first")
    val u = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__x"))
    // TWO corpus passes total (the inherent minimum: S_g first, then
    // deviations): the groups-grid sums pin so the deviation join does
    // not re-derive them from the corpus, and the groups-grid devs pin
    // so the three closing branches read k rows, not the corpus (plan
    // check: 4 scans, no ReusedExchange, before)
    val spark = df.sparkSession
    val sumsPin = Pinned.checkpoint(u.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
      .filter(col("__n") >= 2))
    val sums = sumsPin.df
    val devsPin = Pinned.checkpoint(u.join(broadcast(sums), "__g")
      .withColumn("__u", abs(col("__x") * col("__n") - col("__s")))
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n"),
        sum(col("__u")).cast("decimal(38,0)").as("__su"),
        sum((col("__u").cast("decimal(38,0)") * col("__u"))
          .cast("decimal(38,0)")).as("__suu"))
      // z̄_g = Σu/n², Σz²_g = Σu²/n² — exact decimals closed to double
      .withColumn("z_mean", col("__su").cast("double") /
        (col("n") * col("n")).cast("double"))
      .withColumn("__zsq", col("__suu").cast("double") /
        (col("n") * col("n")).cast("double")))
    val devs = devsPin.df
    val k = devs.count()
    require(k >= 2, s"levene: $k groups (need >= 2)")
    def foldSorted(v: org.apache.spark.sql.Column) = aggregate(
      transform(array_sort(collect_list(struct(
        col("__g").cast("string").as("g"), v.as("v")))),
        p => p.getField("v")),
      lit(0.0), (acc, x) => acc + x)
    val tot = devs.agg(sum(col("n")).as("__nn"),
      foldSorted(col("n").cast("double") * col("z_mean")).as("__sz"))
    val withBar = devs.crossJoin(broadcast(tot))
      .withColumn("__zbar", col("__sz") / col("__nn").cast("double"))
    val parts = withBar.agg(
      foldSorted(col("n").cast("double") *
        (col("z_mean") - col("__zbar")) * (col("z_mean") - col("__zbar")))
        .as("__between"),
      foldSorted(col("__zsq") -
        col("n").cast("double") * col("z_mean") * col("z_mean"))
        .as("__within"),
      max(col("__nn")).as("__n"))
    val p = parts.head()
    val (between, within, nn) =
      (p.getDouble(0), p.getDouble(1), p.getLong(2))
    require(within > 0.0,
      "levene: zero within-group deviation — every group is constant")
    val wStat = (nn - k).toDouble / (k - 1).toDouble * between / within
    val out = withBar
      .select(col("__g").as(groupCol), col("n"),
        round(col("z_mean"), 6).as("z_mean"),
        round(lit(wStat), 6).as("w"),
        lit(k - 1).as("df1"), lit(nn - k).as("df2"))
      .orderBy(col(groupCol))
    try Grids.collectBounded(out, "levene group grid")
    finally { devsPin.release(); sumsPin.release() }
  }

  /** One-way ANOVA F across k groups — the MEAN-difference omnibus the
    * suite's rank form (q319 Kruskal–Wallis) deliberately avoids being:
    * KW asks "do the distributions differ in location on ranks";
    * ANOVA asks "do the means differ in the metric's own units", which
    * is the question when the metric IS the business quantity (spend,
    * tokens). Reported with η² = SSB/SST, the variance-explained
    * effect size the F alone hides (a huge N makes tiny effects
    * "significant"; η² stays honest). [[levene]] is its assumption
    * check.
    *
    * INTEGER-DOMAIN CONTRACT (the levene house rule): x integer-scaled
    * only, so per group n_g, S_g = Σx and Q_g = Σx² are exact (Q in
    * DECIMAL(38,0) — x² fits a long, the sum may not). The close:
    * A = Σ_g S_g²/n_g folded in GROUP ORDER (one IEEE tree both
    * engines replay), CF = S²/N, SSB = A − CF, SSW = Q − A,
    * F = (SSB/(k−1))/(SSW/(N−k)). One row: (k, n, df1, df2, f_stat,
    * eta_sq).
    *
    * Scale shape: ONE map-side-combined corpus pass onto the groups
    * grid; everything after runs on k rows (loudly bounded 2¹⁰). */
  def anovaOneWay(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"anovaOneWay: valueCol '$valueCol' is $vt — values must be " +
        "integer-scaled (chars, tokens, cents)")
    val u = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("long").as("__x"))
    val census = u.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        // cast BEFORE the multiply — x² of a cent-scaled value can
        // wrap int64
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__q"))
    // bounded collect BEFORE any driver hold (the Grids discipline): a
    // continuous group column must refuse, not OOM
    val cells = census.limit((1 << 10) + 1).collect().sortBy(_.getString(0))
    val k = cells.length.toLong
    require(k >= 2 && k <= (1 << 10),
      s"anovaOneWay: $k groups outside [2, 1024] — group census must " +
        "be metadata-bounded")
    val n = cells.map(_.getLong(1)).sum
    require(n > k, s"anovaOneWay: n=$n rows for k=$k groups (need n > k)")
    val s = cells.map(_.getLong(2)).sum
    val q = cells.map(r => BigDecimal(r.getDecimal(3))).sum
    // A folds per-group IEEE terms in group order — the replay contract
    val a = cells.foldLeft(0.0) { (acc, r) =>
      acc + r.getLong(2).toDouble * r.getLong(2).toDouble /
        r.getLong(1).toDouble
    }
    val cf = s.toDouble * s.toDouble / n.toDouble
    val ssb = a - cf
    val ssw = q.toDouble - a
    val sst = q.toDouble - cf
    require(ssw > 0.0,
      "anovaOneWay: zero within-group variance — every group is constant")
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    val spark = df.sparkSession
    spark.range(1).select(lit(k).as("k"), lit(n).as("n"),
      lit(k - 1).as("df1"), lit(n - k).as("df2"),
      round(lit(f), 6).as("f_stat"),
      round(lit(ssb / sst), 6).as("eta_sq"))
  }

  /** One-way random-effects ICC(1) + design effect — the CLUSTERING
    * answer [[anovaOneWay]]'s fixed-effects F cannot give, on a group
    * key that is CORPUS-keyed (customers, sessions), not
    * metadata-bounded: how much of the variance lives BETWEEN clusters
    * (ICC), and therefore how much a clustered sample's information
    * shrinks (DEFF = 1 + (m̄−1)·ICC, n_eff = N/DEFF — the number every
    * cluster-randomized readout silently needs). Unbalanced ANOVA
    * estimator (Searle): with n₀ = (N − Σnᵢ²/N)/(k−1),
    * ICC = (MSB − MSW)/(MSB + (n₀−1)·MSW).
    *
    * Exactness: the group census stays DISTRIBUTED (no driver collect
    * — the group key is corpus-cardinality by design); per-group
    * double terms S²/n and the exact integers n, n² accumulate as
    * DECIMAL(38,12)/(38,0) ledgers; the close is one fixed double
    * tree. One row: (k, n, icc, deff, n_eff).
    *
    * Scale shape: one map-side-combined census onto the group key, one
    * ledger aggregate over the census — two shuffles total, nothing
    * driver-sized anywhere. */
  def iccOneWay(df: DataFrame, groupCol: String,
                valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"iccOneWay: valueCol '$valueCol' is $vt — integer-scaled only")
    val census = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__x"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__q"))
      .filter(col("__n") >= 2) // singleton clusters carry no within info
    val r = census.agg(count(lit(1)).as("k"),
      sum(col("__n")).as("n"), sum(col("__s")).as("s"),
      sum(col("__q")).as("q"),
      sum(col("__n").cast("decimal(38,0)") * col("__n")).as("sn2"),
      sum((col("__s").cast("double") * col("__s").cast("double") /
        col("__n").cast("double")).cast("decimal(38,12)")).as("a"))
      .head()
    val k = r.getLong(0)
    require(k >= 2, s"iccOneWay: $k clusters with >= 2 rows (need >= 2)")
    val n = r.getLong(1)
    val s = r.getLong(2)
    val q = BigDecimal(r.getDecimal(3)).toDouble
    val sn2 = BigDecimal(r.getDecimal(4)).toDouble
    val a = BigDecimal(r.getDecimal(5)).toDouble
    val cf = s.toDouble * s.toDouble / n.toDouble
    val ssb = a - cf
    val ssw = q - a
    require(ssw > 0.0, "iccOneWay: zero within-cluster variance")
    val msb = ssb / (k - 1).toDouble
    val msw = ssw / (n - k).toDouble
    val n0 = (n.toDouble - sn2 / n.toDouble) / (k - 1).toDouble
    val icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    val mbar = n.toDouble / k.toDouble
    val deff = 1.0 + (mbar - 1.0) * icc
    require(deff > 0.0, "iccOneWay: non-positive design effect")
    val spark = df.sparkSession
    spark.range(1).select(lit(k).as("k"), lit(n).as("n"),
      round(lit(icc), 6).as("icc"), round(lit(deff), 6).as("deff"),
      round(lit(n.toDouble / deff), 6).as("n_eff"))
  }
}
