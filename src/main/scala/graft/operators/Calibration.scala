package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-calibration audits for model-in-the-loop curation — when a
  * classifier's scores gate data (quality filters, safety filters,
  * retrieval rerankers), the score must MEAN its confidence: a filter
  * at 0.9 that is right 60% of the time silently reshapes the corpus.
  *
  * [[ece]] — reliability table + Expected Calibration Error (Naeini et
  * al. 2015 binning form): scores bucket on a FIXED decimal grid, per
  * bin the gap |avg confidence − accuracy|, ECE = Σ (n_b/N)·gap_b.
  * Exactness: confidences accumulate as floor(score·10⁶) BIGINTs (the
  * engine's basis-point discipline — double sums would be partitioning-
  * dependent), accuracy is an integer ratio, and the closing ECE folds
  * the ≤ bins-row grid in bin order (array_sort + ordered aggregate —
  * the fixed-fold-order rule), so the doubles replay bit-identically.
  *
  * [[conformalThreshold]] — split-conformal calibration (Vovk et al.;
  * Papadopoulos et al. 2002): per group, the ⌈(1−α)(n+1)⌉-th smallest
  * nonconformity score. Future points then exceed the threshold with
  * probability ≤ α (exchangeability) — the distribution-free way to
  * turn any heuristic score into a guaranteed-coverage gate. Pure
  * integer order-statistic selection (the q73 element-selection idiom,
  * α as an exact rational); empirical coverage is reported beside the
  * threshold as exact integers.
  *
  * Scale shape: ece is one narrow projection + a bins-row map-side-
  * combined aggregate; conformal is one `Exchange(group)` window
  * (groups plural per corpus — the q167 contract) + a group aggregate.
  * The corpus is scanned once in each. */
object Calibration {

  /** Reliability table: (bin, n, n_pos, sum_conf_ppm, conf, acc, gap,
    * ece) — one row per non-empty bin, `ece` repeated on each row. The
    * score must already be in [0, 1]; bin = min(floor(score·bins),
    * bins−1). */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
          bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val s = col(scoreCol).cast("double")
    val binned = df
      .filter(s.isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(s * bins), lit(bins - 1)).cast("int").as("bin"),
        floor(s * 1000000L).cast("long").as("__ppm"),
        col(labelCol).cast("boolean").cast("long").as("__y"))
    val perBin = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__ppm")).as("sum_conf_ppm"))
      .withColumn("conf",
        col("sum_conf_ppm").cast("double") / (col("n") * 1000000L).cast("double"))
      .withColumn("acc", col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("gap", abs(col("conf") - col("acc")))
    // ECE folds the bin grid in bin order — a window SUM over doubles
    // would be order-unspecified; the sorted-struct aggregate is not
    val eceRow = perBin
      .agg(array_sort(collect_list(struct(col("bin"), (col("n").cast("double") *
          col("gap")).as("w")))).as("ps"),
        sum(col("n")).as("__n"))
      .select((aggregate(transform(col("ps"), p => p("w")), lit(0.0),
        (a, x) => a + x) / col("__n").cast("double")).as("ece"))
    perBin.crossJoin(broadcast(eceRow))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_conf_ppm"),
        col("conf"), col("acc"), col("gap"), col("ece"))
      .orderBy(col("bin"))
  }

  /** Per-group split-conformal threshold at miscoverage α = alphaNum /
    * alphaDen: (group, n, q_rank, qhat, n_covered). q_rank =
    * ⌈(1−α)(n+1)⌉ clamped to n (a group smaller than 1/α − 1 cannot
    * certify the coverage level — its threshold saturates at the max,
    * reported honestly by q_rank = n).
    *
    * INTEGER-DOMAIN CONTRACT (the [[ExactQuantile]] house rule, now
    * enforced): `scoreCol` must already be an integral type. Fractional
    * nonconformity scores (e.g. 1 − softmax ∈ (0,1)) must be scaled to
    * a fixed grid by the caller first — `floor(score · 10^6)` — or every
    * score would silently truncate to 0 and qhat would be meaningless.
    * The rank boundary itself is exact ceiling division, no float. */
  def conformalThreshold(df: DataFrame, groupCol: String, scoreCol: String,
                         alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0, 1): $alphaNum/$alphaDen")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val st = df.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(st),
      s"conformalThreshold: scoreCol '$scoreCol' is $st — scores must be " +
        "integral (scale fractional scores to a fixed grid first, e.g. " +
        "floor(score * 1e6); a silent cast would truncate (0,1) scores to 0)")
    val rows = df.select(col(groupCol).as("__g"), col(scoreCol).cast("long").as("__s"))
      .filter(col("__s").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__s"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
    // ⌈(1−α)(n+1)⌉ = ⌈(alphaDen−alphaNum)(n+1) / alphaDen⌉ — exact
    // integer ceiling division, no float on the rank boundary
    val m = alphaDen - alphaNum
    val ranked = rows
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("q_rank",
        least(expr(s"(($m * (n + 1)) + ${alphaDen - 1}) div $alphaDen"), col("n")))
    val qhat = ranked.filter(col("__rn") === col("q_rank"))
      .select(col("__g"), col("n"), col("q_rank"), col("__s").as("qhat"))
    val covered = rows.join(qhat.select(col("__g"), col("qhat")), "__g")
      .filter(col("__s") <= col("qhat"))
      .groupBy(col("__g")).agg(count(lit(1)).as("n_covered"))
    qhat.join(covered, "__g")
      .select(col("__g").as(groupCol), col("n"), col("q_rank"),
        col("qhat"), col("n_covered"))
  }

  /** Murphy decomposition of the Brier score — what [[ece]] cannot
    * separate: a calibrated model can still be USELESS (it always
    * predicts the base rate), and a sharp model can be miscalibrated;
    * Murphy (1973) splits the binned Brier score into exactly those
    * axes:
    *
    *   brier ≈ reliability − resolution + uncertainty
    *   reliability = Σₖ nₖ(confₖ − accₖ)²/N   (miscalibration, ↓ good)
    *   resolution  = Σₖ nₖ(accₖ − ȳ)²/N       (sharpness, ↑ good)
    *   uncertainty = ȳ(1 − ȳ)                  (data's own noise floor)
    *
    * Exactness: scores pin to the 1e-6 grid (the [[ece]] ppm rule), so
    * per-bin Σs and Σs² are exact BIGINT/DECIMAL sums alongside the
    * exact label counts; the raw Brier closes from those exact totals
    * (Σs² − 2Σs·y + Σy, all pinned-integer sums), and the three
    * decomposition terms fold the bin grid in bin order (the q279
    * discipline). Output: one row per bin (bin, n, n_pos, conf, acc)
    * with (brier, reliability, resolution, uncertainty) repeated.
    *
    * Scale shape: ONE map-side-combined aggregate onto the ≤bins grid;
    * the folds run on bins rows. */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= Grids.DefaultMaxRows,
      s"need 2..${Grids.DefaultMaxRows} bins, got $bins")
    val s = col(scoreCol).cast("double")
    val binned = df
      .filter(s.isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(s * bins), lit(bins - 1)).cast("int").as("bin"),
        floor(s * 1000000L).cast("long").as("__ppm"),
        col(labelCol).cast("boolean").cast("long").as("__y"))
    // ONE corpus pass: the bins grid pins (the totals/folds branches
    // otherwise re-scan); the bins-bounded result re-emits driver-side
    val spark = df.sparkSession
    Pinned.withCheckpoint(binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__ppm")).as("__ss"),
        sum((col("__ppm").cast("decimal(38,0)") * col("__ppm"))
          .cast("decimal(38,0)")).as("__sss"),
        sum(col("__ppm") * col("__y")).as("__ssy"))
      .withColumn("conf", col("__ss").cast("double") /
        (col("n") * 1000000L).cast("double"))
      .withColumn("acc",
        col("n_pos").cast("double") / col("n").cast("double"))
    ) { perBin =>
    def foldSorted(v: org.apache.spark.sql.Column) = aggregate(
      transform(array_sort(collect_list(struct(col("bin"), v.as("v")))),
        p => p.getField("v")),
      lit(0.0), (a, x) => a + x)
    val tot = perBin.agg(sum(col("n")).as("__n"),
      sum(col("n_pos")).as("__npos"),
      sum(col("__sss")).cast("decimal(38,0)").as("__tsss"),
      sum(col("__ss")).as("__tss"), sum(col("__ssy")).as("__tssy"))
    val withTot = perBin.crossJoin(broadcast(tot))
      .withColumn("__ybar",
        col("__npos").cast("double") / col("__n").cast("double"))
    val scalars = withTot.agg(
      foldSorted((col("n").cast("double") *
        (col("conf") - col("acc")) * (col("conf") - col("acc"))))
        .as("__rel"),
      foldSorted((col("n").cast("double") *
        (col("acc") - col("__ybar")) * (col("acc") - col("__ybar"))))
        .as("__res"),
      max(col("__n")).as("__nn"), max(col("__npos")).as("__np"),
      max(col("__tsss")).as("__a"), max(col("__tss")).as("__b"),
      max(col("__tssy")).as("__c"))
    val closed = scalars.select(
      round(col("__rel") / col("__nn").cast("double"), 6)
        .as("reliability"),
      round(col("__res") / col("__nn").cast("double"), 6).as("resolution"),
      round((col("__np").cast("double") / col("__nn").cast("double")) *
        (lit(1.0) - col("__np").cast("double") / col("__nn").cast("double")),
        6).as("uncertainty"),
      // brier = Σ(s − y)²/N off the exact ppm sums: s², −2sy, y² (= y)
      round((col("__a").cast("double") / lit(1e12) -
        lit(2.0) * col("__c").cast("double") / lit(1e6) +
        col("__np").cast("double")) / col("__nn").cast("double"), 6)
        .as("brier"))
    val out = perBin.crossJoin(broadcast(closed))
      .select(col("bin"), col("n"), col("n_pos"), round(col("conf"), 6)
        .as("conf"), round(col("acc"), 6).as("acc"),
        col("brier"), col("reliability"), col("resolution"),
        col("uncertainty"))
      .orderBy(col("bin"))
    Grids.collectBounded(out, "brier bin grid")
    }
  }
}
