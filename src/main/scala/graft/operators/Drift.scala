package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source token-distribution drift — Total Variation distance
  * between each source's token distribution and the whole corpus's:
  * the "which feed is the odd one out" audit (a scraper that switched
  * language, a feed that started emitting boilerplate, a source whose
  * topic mix shifted between corpus versions all move their TV score;
  * run per version pair for temporal drift).
  *
  * TV(p, q) = ½ Σ_t \|p_t − q_t\| — chosen over KL/JS because it needs
  * NO logarithms: with integer counts c_st (source) and c_t (corpus),
  * totals T_s and T,
  *
  *   TV_s = [ Σ_{t∈s} \|c_st·T − c_t·T_s\| + T_s·(T − Σ_{t∈s} c_t) ] / (2·T_s·T)
  *
  * where the second term folds in every corpus term ABSENT from the
  * source (the chi2 zero-cell algebra: their contribution is exactly
  * c_t·T_s) — so nothing source×vocabulary is ever materialized. The
  * numerator and denominator are exact BIGINTs; one pinned double
  * division closes.
  *
  * Scale shape: one (source, term) map-side-combined count over the
  * corpus; the corpus count table is vocab-bounded and joins the
  * source×term table on term; outputs are one row per source. */
object Drift {

  private def toks(df: DataFrame, textCol: String) =
    explode(filter(split(col(textCol), " "), w => w =!= ""))

  /** (source, n_tokens, tv) — tv in [0, 1], 0 = identical mix. */
  def sourceTv(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val st = df.select(col(sourceCol).as("source"), toks(df, textCol).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("cst"))
    val corpus = st.groupBy(col("t")).agg(sum(col("cst")).as("ct"))
    val totals = st.groupBy(col("source")).agg(sum(col("cst")).as("ts"))
    val grandT = corpus.agg(sum(col("ct")).as("tt")) // one row
    // The st⋈corpus join stays a shuffle join on `t`: st is already
    // key-partitioned on t from its own groupBy, and the corpus count
    // table is VOCABULARY-sized — web-scale text vocab (URLs, typos,
    // numerals) runs 10⁸–10⁹ distinct terms, far past broadcast
    // capacity, and an explicit hint would bypass the autoBroadcast
    // threshold. totals (per-source) and grandT (one row) stay hinted.
    st.join(corpus, "t")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grandT))
      .groupBy(col("source"))
      .agg(
        first(col("ts")).as("n_tokens"),
        first(col("tt")).as("__tt"),
        sum(abs(col("cst") * col("tt") - col("ct") * col("ts"))).as("__present"),
        sum(col("ct")).as("__covered")) // Σ corpus counts of the source's terms
      .select(col("source"), col("n_tokens"),
        ((col("__present") + col("n_tokens") * (col("__tt") - col("__covered")))
          .cast("double") /
          (lit(2.0) * col("n_tokens").cast("double") * col("__tt").cast("double")))
          .as("tv"))
  }

  /** Hellinger distance between two samples' value distributions —
    * the bounded, symmetric drift metric the family lacked: TV counts
    * mass moved, KS takes the worst single point, PSI needs reference
    * bins and blows up on empty cells; Hellinger H ∈ [0,1] weights the
    * WHOLE overlap smoothly (H² = 1 − Σ√(p_v·q_v)) and is the metric
    * of choice for comparing discrete feature distributions between
    * corpus slices (Hellinger 1909; the Bhattacharyya coefficient BC is
    * the reported overlap).
    *
    * Exactness: the (value, side) census is one exact BIGINT aggregate;
    * per-cell terms √(a_v·b_v) use IEEE sqrt — CORRECTLY ROUNDED by the
    * standard in every engine (unlike libm exp/log), so each term is
    * bit-identical; terms fold over the value grid in value order (the
    * q279 discipline), and BC = fold/√(n_a·n_b), H = √(max(0, 1−BC))
    * close in pinned doubles, 6-dp. `valueCol` must be integral and
    * PRE-QUANTIZED (the ksTwoSample contract) — the grid is loudly
    * bounded because the fold materializes it.
    *
    * Scale shape: one map-side-combined census onto the value grid;
    * the fold runs on grid rows. */
  def hellinger(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, tag: Int) =
      df.select(col(valueCol).cast("long").as("__v"))
        .filter(col("__v").isNotNull)
        .withColumn("__s", lit(tag))
    val u = side(a, 0).unionByName(side(b, 1))
    val spark = a.sparkSession
    Pinned.withCheckpoint(u.groupBy(col("__v"))
      .agg(sum(when(col("__s") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__cb"))
    ) { cells =>
      val gridN = cells.count()
      require(gridN >= 1 && gridN <= Grids.DefaultMaxRows,
        s"hellinger: $gridN grid values — pre-quantize the feature " +
          "(the ksTwoSample contract)")
      val p = cells.agg(
        sum(col("__ca")).as("na"), sum(col("__cb")).as("nb"),
        aggregate(
          transform(array_sort(collect_list(struct(col("__v"),
            (col("__ca") * col("__cb")).as("ab")))),
            t => sqrt(t.getField("ab").cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("__fold")).head()
      val (na, nb) = (p.getLong(0), p.getLong(1))
      require(na > 0 && nb > 0, s"hellinger: empty side ($na, $nb)")
      val bc = p.getDouble(2) / math.sqrt(na.toDouble * nb.toDouble)
      val h = math.sqrt(math.max(0.0, 1.0 - bc))
      spark.range(1).select(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(gridN).as("grid"), round(lit(bc), 6).as("bc"),
        round(lit(h), 6).as("hellinger"))
    }
  }

  /** Two-sample Kolmogorov–Smirnov statistic, each source vs its
    * complement, over an integer-valued feature (doc length, token
    * count — continuous features must be pre-quantized to a grid by the
    * caller). The distribution-SHAPE companion to [[sourceTv]]'s token
    * mix: a feed that started truncating documents or concatenating
    * pages moves its KS long before its vocabulary shifts.
    *
    * D_s = sup_x |F_s(x) − F_rest(x)|. The sup over the pooled value
    * grid is exact (both EDFs are constant between pooled jump points),
    * and with integer cumulative counts k_s(x), k(x) and totals n_s, n:
    *
    *   D_s · n_s·(n−n_s) = max_x | k_s(x)·(n−n_s) − (k(x)−k_s(x))·n_s |
    *
    * — an exact BIGINT maximum (`ks_num`); one pinned double division
    * closes. No per-row ranks, no p-value approximations.
    *
    * Scale shape: one (source, value) map-side-combined count over the
    * corpus, then a |values|×|sources| grid (value cardinality is
    * bounded by the feature's quantization, NOT the corpus) windowed
    * per source — the corpus is scanned once and never shuffled. */
  def ksPerSource(df: DataFrame, valueCol: String, sourceCol: String): DataFrame = {
    // NULL has no place on an EDF, and engines disagree on NULL sort
    // order — excluded by definition, not left to the window
    val c = df.select(col(sourceCol).as("source"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
    val vt = c.groupBy(col("v")).agg(sum(col("cnt")).as("ct"))
    val ns = c.groupBy(col("source")).agg(sum(col("cnt")).as("nsrc"))
    val tot = vt.agg(sum(col("ct")).as("n")) // one row
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vt.crossJoin(broadcast(ns))
      .join(c, Seq("source", "v"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("cums", sum(col("cnt")).over(w))
      .withColumn("cumt", sum(col("ct")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("num", abs(
        col("cums") * (col("n") - col("nsrc")) -
          (col("cumt") - col("cums")) * col("nsrc")))
      .groupBy(col("source"))
      .agg(first(col("nsrc")).as("n_source"),
        first(col("n") - col("nsrc")).as("n_rest"),
        max(col("num")).as("ks_num"))
      .withColumn("ks", // a lone source has no complement EDF: NULL, not ±Inf
        when(col("n_rest") === 0, lit(null))
          .otherwise(col("ks_num").cast("double") /
            (col("n_source") * col("n_rest")).cast("double")))
  }

  /** Embedding-space drift per group: cosine between each group's
    * centroid and the CORPUS centroid — the vector-space companion to
    * the scalar audits (a slice whose embeddings migrated — topic
    * shift, encoder swap, corrupted batch — drops its cosine long
    * before scalar stats move). Cosine is scale-invariant, so
    * centroids are represented by their integer SUM vectors on the
    * 2^gridBits grid (no division): sums are exact BIGINTs on any
    * partitioning, and the closing dot/norms are ORDERED double folds
    * over dims (each product correctly rounded, fold order fixed) —
    * bit-identical in any engine, no float accumulation ambiguity.
    *
    * Scale shape: one narrow quantize projection, one map-side-combined
    * per-(group, dim) sum (shuffle = groups×dims rows), corpus sums
    * reduce from the group sums — the corpus is scanned once. */
  def centroidDrift(df: DataFrame, groupCol: String, vecCol: String,
                    gridBits: Int = 20): DataFrame = {
    val grid = 1L << gridBits
    val g = df.select(col(groupCol).as("g"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * grid).cast("long"))).as(Seq("pos", "q")))
    val perDim = g.groupBy(col("g"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("cnt"))
    val gSums = perDim.groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"),
        first(col("cnt")).as("n"))
      .select(col("g"), col("n"), transform(col("ps"), p => p("s")).as("sums"))
    val cSums = perDim.groupBy(col("pos")).agg(sum(col("s")).as("cs"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cs")))).as("ps"))
      .select(transform(col("ps"), p => p("cs")).as("csums"))
    def fold(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0), (a, x) => a + x)
    gSums.crossJoin(broadcast(cSums))
      .withColumn("__dot", fold(zip_with(col("sums"), col("csums"),
        (a, b) => a.cast("double") * b.cast("double"))))
      .withColumn("__n1", fold(transform(col("sums"),
        a => a.cast("double") * a.cast("double"))))
      .withColumn("__n2", fold(transform(col("csums"),
        a => a.cast("double") * a.cast("double"))))
      .select(col("g").as(groupCol), col("n"),
        (col("__dot") / (sqrt(col("__n1")) * sqrt(col("__n2")))).as("cos_corpus"))
  }

  /** Embedding covariance audit — the full d×d second-moment matrix on
    * the integer grid: dead dimensions (zero variance), scale-skewed
    * dimensions, and strongly-correlated dimension pairs (anisotropy —
    * the reason raw embedding cosines saturate) all read directly off
    * this table, and it is the exact input a whitening/PCA step would
    * consume. Gate columns are the raw EXACT sums (Σqᵢqⱼ, Σqᵢ, Σqⱼ, n
    * — each bounded by n·2^(2·gridBits), no overflow for gridBits=20
    * up to ~10⁶ rows; lower gridBits for more) and the closing
    * covariance is structured double arithmetic (each op correctly
    * rounded ⇒ engine-identical).
    *
    * Scale shape: the d² outer product explodes MAP-SIDE into a
    * map-side-combined (i, j) aggregate — the shuffle carries d²
    * summary rows per task, never rows×d². d is the embedding dim
    * (64–4096): d² output rows are a driver-friendly table by
    * construction. Only the upper triangle (i ≤ j) is emitted. */
  def covarianceAudit(df: DataFrame, vecCol: String,
                      gridBits: Int = 20): DataFrame = {
    val grid = 1L << gridBits
    val q = df.select(transform(col(vecCol),
      x => floor(x.cast("double") * grid).cast("long")).as("__q"))
    val pairs = q.select(posexplode(col("__q")).as(Seq("i", "qi")), col("__q"))
      .select(col("i"), col("qi"), posexplode(col("__q")).as(Seq("j", "qj")))
      .filter(col("i") <= col("j"))
    pairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("qi") * col("qj")).as("sxy"),
        sum(col("qi")).as("sx"), sum(col("qj")).as("sy"))
      .withColumn("cov",
        (col("sxy").cast("double") / col("n").cast("double") -
          (col("sx").cast("double") / col("n").cast("double")) *
            (col("sy").cast("double") / col("n").cast("double"))) /
          (grid.toDouble * grid.toDouble))
  }

  /** One-row two-sample KS: (n_a, n_b, ks_num, ks) — `a` vs `b` on an
    * integer feature. A two-source [[ksPerSource]] (source "a"'s
    * complement IS b), so the grid algebra and exactness carry over.
    * Both inputs must be non-empty (an empty side has no EDF). */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val u = a.select(col(valueCol).cast("long").as("__v"), lit("a").as("__t"))
      .unionByName(b.select(col(valueCol).cast("long").as("__v"), lit("b").as("__t")))
    ksPerSource(u, "__v", "__t")
      .filter(col("source") === "a")
      .select(col("n_source").as("n_a"), col("n_rest").as("n_b"),
        col("ks_num"), col("ks"))
  }

  /** Population Stability Index against reference-quantile bins — the
    * scorecard-monitoring drift metric (the credit-risk industry's
    * standard alongside this family's KS/TV): bin edges are EXACT
    * order statistics of the REFERENCE (deciles by default, the
    * [[ExactQuantile]] machinery — the monitor never learns from what
    * it monitors, the q208 discipline), both sides bin against those
    * edges, and PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur) folds the
    * ≤bins grid in bin order. Empty cells take the standard count-1
    * floor (a zero cell makes the ln undefined; the floor is the
    * documented convention, not a silent skip). Readers use the usual
    * bands: <0.1 stable, 0.1–0.25 shifting, >0.25 drifted.
    *
    * Per (bin): (bin, n_ref, n_cur, term, psi) with `psi` repeated —
    * the per-bin terms are the attribution (WHICH score band moved).
    * `valueCol` must be integral (micro-scale first). One pass per
    * side + the audited two-phase edge selection. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          bins: Int = 10): DataFrame = {
    val (edges, rv) = psiEdges(ref, valueCol, bins)
    val cv = cur.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    require(!cv.isEmpty, "psi: current sample is empty")
    val bin = psiBin(edges)
    psiFromCells(
      rv.select(bin.as("bin"), lit(1L).as("__r"), lit(0L).as("__c"))
        .unionByName(cv.select(bin.as("bin"), lit(0L).as("__r"),
          lit(1L).as("__c")))
        .groupBy(col("bin"))
        .agg(sum(col("__r")).as("n_ref"), sum(col("__c")).as("n_cur")))
  }

  /** Reference-quantile edges + the projected reference values — the
    * build-once half the streaming monitor persists. */
  def psiEdges(ref: DataFrame, valueCol: String,
               bins: Int): (Seq[Long], DataFrame) = {
    require(bins >= 2 && bins <= 100, s"bad bins=$bins")
    val rv = ref.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val n = rv.count()
    require(n >= bins, s"reference has $n rows for $bins bins")
    (ExactQuantile.globalRanks(rv, "__v",
        (1 until bins).map(k => (k * n + bins - 1) / bins), lowBits = 8)
      .collect().map(_.getLong(1)).sorted.toSeq, rv)
  }

  /** The bin-assignment expression for a fixed edge list (applies to a
    * `__v` long column). */
  def psiBin(edges: Seq[Long]): org.apache.spark.sql.Column =
    edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("__v") > e, 1).otherwise(0)
    }

  /** Exact 1-Wasserstein (earth-mover) distance between two integer
    * distributions — the drift metric PSI/KS cannot substitute for: KS
    * reports the worst single gap and PSI the log-ratio of bin masses,
    * but only W₁ = ∫|F_ref − F_cur| answers "HOW FAR did the mass
    * move, in the value's own units" (a 1-token shift of every
    * document and a 1000-token shift of every document have the same
    * KS; their W₁ differs 1000×). Reference: Villani, Optimal
    * Transport (2009) §1 — on ℝ¹, W₁ = Σᵢ |CDF_ref(vᵢ) − CDF_cur(vᵢ)|
    * · (vᵢ₊₁ − vᵢ) over the merged distinct-value grid.
    *
    * Exactness: with nr = |ref| and nc = |cur|, each grid term is the
    * INTEGER |cum_ref·nc − cum_cur·nr| · gap accumulated in
    * DECIMAL(38,0); the single closing division by nr·nc (and the
    * support-width normalisation) are the only floating point — the
    * result is bit-stable on any partitioning and SQL-replayable.
    *
    * Scale shape: one map-side-combined aggregate onto the DISTINCT
    * VALUE grid (integer-scaled metrics: n_chars, token counts, cents
    * — domain-bounded, not corpus-bounded), then the cumsum window on
    * that grid. The grid contract is the medianByTwoPhase discipline:
    * a loud require caps it at 2²² cells — callers with wider domains
    * pre-bucket (e.g. `floor(v/scale)`), which keeps W₁ exact up to
    * the bucket width. Output: one row (n_ref, n_cur, lo, hi, w1,
    * w1_norm). */
  def wasserstein1(ref: DataFrame, cur: DataFrame,
                   valueCol: String): DataFrame = {
    val rv = ref.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val cv = cur.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    // ONE corpus pass: the value-grid cells materialize into a tracked
    // checkpoint (grid-sized), and the require/totals/window branches
    // all read the pinned grid instead of re-scanning the corpus (the
    // naive form measured THREE full scans: count + totals + window);
    // the close is driver-side literals (the ols2 idiom), so the pin
    // releases deterministically before returning
    val spark = ref.sparkSession
    Pinned.withCheckpoint(
      rv.select(col("__v"), lit(1L).as("__r"), lit(0L).as("__c"))
        .unionByName(cv.select(col("__v"), lit(0L).as("__r"),
          lit(1L).as("__c")))
        .groupBy(col("__v"))
        .agg(sum(col("__r")).as("__nr"), sum(col("__c")).as("__nc"))
    ) { cells =>
      val grid = cells.count()
      require(grid >= 1, "wasserstein1: both samples are empty")
      require(grid <= (1 << 22),
        s"wasserstein1: $grid distinct values exceeds the 2^22 grid " +
          "bound — pre-bucket the value column (floor(v/scale)) first")
      val w = Window.orderBy(col("__v")) // grid-bounded by the require
      val terms = cells
        .withColumn("__cr", sum(col("__nr")).over(w))
        .withColumn("__cc", sum(col("__nc")).over(w))
        .withColumn("__gap", coalesce(
          lead(col("__v"), 1).over(w) - col("__v"), lit(0L)))
      val nrc = cells.agg(sum(col("__nr")).as("__tnr"),
        sum(col("__nc")).as("__tnc"),
        min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
      val r = terms.crossJoin(broadcast(nrc))
        .agg(max(col("__tnr")).as("n_ref"), max(col("__tnc")).as("n_cur"),
          max(col("__lo")).as("lo"), max(col("__hi")).as("hi"),
          sum((abs(col("__cr").cast("decimal(38,0)") * col("__tnc") -
            col("__cc").cast("decimal(38,0)") * col("__tnr")) *
            col("__gap")).cast("decimal(38,0)")).as("__num"))
        .head()
      val (nr, nc, lo, hi) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val num = BigDecimal(r.getDecimal(4))
      val w1 = num.toDouble / (nr.toDouble * nc.toDouble)
      spark.range(1).select(lit(nr).as("n_ref"), lit(nc).as("n_cur"),
        lit(lo).as("lo"), lit(hi).as("hi"),
        round(lit(w1), 6).as("w1"),
        (if (hi > lo)
          round(lit(num.toDouble / (nr.toDouble * nc.toDouble *
            (hi - lo).toDouble)), 6)
        else lit(null).cast("double")).as("w1_norm"))
    }
  }

  /** Exact two-sample energy distance (Székely & Rizzo 2004) between
    * two integer distributions — the drift metric that sees what W₁
    * (q280) under-weights: W₁ integrates |F−G| linearly, so a wide
    * thin gap and a narrow thick gap can tie; energy distance
    * D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| (the V-statistic form, /n²
    * denominators) squares the CDF gap (in ℝ¹, D² = 2∫(F−G)²dv) and
    * is the basis of the energy two-sample test, consistent against
    * EVERY fixed alternative (no binning choice, unlike PSI).
    *
    * The pairwise sums never materialize pairs: over the merged
    * distinct-value grid, Σⱼ|v − yⱼ| = v·(2·C≤(v) − C) − 2·S≤(v) + S
    * with C≤/S≤ the cumulative count/value-sum, so each of the three
    * double-sums is ONE pass over the grid with two cumsum windows.
    *
    * Exactness: counts and value sums are exact integers; each grid
    * term is assembled in DECIMAL(38,0) (partitioning-invariant); the
    * three closing divisions and the test statistic
    * T = nr·nc/(nr+nc)·D² are the only floating point.
    *
    * Scale shape: one map-side-combined census onto the distinct-value
    * grid (domain-bounded — the wasserstein1 contract, 2²² cap; wider
    * domains pre-bucket), cumsum windows on the grid, driver-literal
    * close. Output: one row (n_ref, n_cur, e_cross, e_ref, e_cur, d2,
    * t_stat). */
  def energyDistance(ref: DataFrame, cur: DataFrame,
                     valueCol: String): DataFrame = {
    val rv = ref.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val cv = cur.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val spark = ref.sparkSession
    Pinned.withCheckpoint(
      rv.select(col("__v"), lit(1L).as("__r"), lit(0L).as("__c"))
        .unionByName(cv.select(col("__v"), lit(0L).as("__r"),
          lit(1L).as("__c")))
        .groupBy(col("__v"))
        .agg(sum(col("__r")).as("__nr"), sum(col("__c")).as("__nc"))
    ) { cells =>
      val grid = cells.count()
      require(grid >= 1, "energyDistance: both samples are empty")
      require(grid <= (1 << 22),
        s"energyDistance: $grid distinct values exceeds the 2^22 grid " +
          "bound — pre-bucket the value column (floor(v/scale)) first")
      val w = Window.orderBy(col("__v")) // grid-bounded by the require
      val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val cum = cells
        .withColumn("__cr", sum(col("__nr")).over(w))
        .withColumn("__cc", sum(col("__nc")).over(w))
        .withColumn("__sr", sum(d(col("__v")) * col("__nr")).over(w))
        .withColumn("__sc", sum(d(col("__v")) * col("__nc")).over(w))
      val tot = cells.agg(sum(col("__nr")).as("__tnr"),
        sum(col("__nc")).as("__tnc"),
        sum(d(col("__v")) * col("__nr")).as("__tsr"),
        sum(d(col("__v")) * col("__nc")).as("__tsc"))
      // Σⱼ|v−yⱼ| against each side, from that side's cumulatives
      val absVsRef = d(col("__v")) * (lit(2) * col("__cr") - col("__tnr")) -
        lit(2) * col("__sr") + col("__tsr")
      val absVsCur = d(col("__v")) * (lit(2) * col("__cc") - col("__tnc")) -
        lit(2) * col("__sc") + col("__tsc")
      val r = cum.crossJoin(broadcast(tot))
        .agg(max(col("__tnr")).as("n_ref"), max(col("__tnc")).as("n_cur"),
          sum(d(col("__nr")) * absVsCur).as("__sxy"),
          sum(d(col("__nr")) * absVsRef).as("__sxx"),
          sum(d(col("__nc")) * absVsCur).as("__syy"))
        .head()
      val (nr, nc) = (r.getLong(0), r.getLong(1))
      require(nr > 0 && nc > 0,
        s"energyDistance: empty side (n_ref=$nr, n_cur=$nc)")
      val sxy = BigDecimal(r.getDecimal(2))
      val sxx = BigDecimal(r.getDecimal(3))
      val syy = BigDecimal(r.getDecimal(4))
      val eCross = sxy.toDouble / (nr.toDouble * nc.toDouble)
      val eRef = sxx.toDouble / (nr.toDouble * nr.toDouble)
      val eCur = syy.toDouble / (nc.toDouble * nc.toDouble)
      val d2 = 2.0 * eCross - eRef - eCur
      val tStat = nr.toDouble * nc.toDouble / (nr.toDouble + nc.toDouble) * d2
      spark.range(1).select(lit(nr).as("n_ref"), lit(nc).as("n_cur"),
        round(lit(eCross), 6).as("e_cross"), round(lit(eRef), 6).as("e_ref"),
        round(lit(eCur), 6).as("e_cur"), round(lit(d2), 6).as("d2"),
        round(lit(tStat), 6).as("t_stat"))
    }
  }

  /** PSI from a (bin, n_ref, n_cur) cell table — the serve face shared
    * by the batch audit and the streaming monitor's ledger state. */
  def psiFromCells(cells: DataFrame): DataFrame = {
    val tot = cells.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val terms = cells.crossJoin(broadcast(tot))
      .withColumn("term",
        (greatest(col("n_ref"), lit(1L)).cast("double") / col("__tr") -
          greatest(col("n_cur"), lit(1L)).cast("double") / col("__tc")) *
          log((greatest(col("n_ref"), lit(1L)).cast("double") / col("__tr")) /
            (greatest(col("n_cur"), lit(1L)).cast("double") / col("__tc"))))
    val total = terms.agg(aggregate(
      transform(array_sort(collect_list(struct(col("bin"), col("term")))),
        s => s.getField("term")),
      lit(0.0), (acc, x) => acc + x).as("__psi"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("term"), 6).as("term"), round(col("__psi"), 6).as("psi"))
      .orderBy(col("bin"))
  }
}
