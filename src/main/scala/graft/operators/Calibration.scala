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
}
