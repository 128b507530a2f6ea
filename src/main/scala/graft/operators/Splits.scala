package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `df.randomSplit` draws per-row Bernoulli samples whose outcome depends
  * on partition layout — re-running after a repartition reshuffles the
  * split, which silently leaks validation data into training sets. These
  * splits hash a STABLE ID instead: the same row lands in the same split
  * on any cluster, any partitioning, any engine (the arithmetic is plain
  * 64-bit integer math, so an external system — or the DuckDB oracle —
  * reproduces it exactly).
  *
  * Hash: Knuth multiplicative ((id mod 2^31) * 2654435761 mod 2^32),
  * then bucket mod `buckets`. The 2^31 pre-reduction keeps the product
  * under 2^63, so the arithmetic never overflows SIGNED 64-bit — engines
  * that error on overflow (DuckDB, ANSI SQL) reproduce it verbatim,
  * which an unreduced id*K (wrap-around semantics) would break for ids
  * above ~3.5e9. Not cryptographic — fine for splitting, not for
  * adversarial inputs.
  */
object Splits {

  private val KnuthC = 2654435761L
  private val TwoTo31 = 2147483648L
  private val TwoTo32 = 4294967296L

  /** Stable bucket in [0, buckets) from a non-negative integer id. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(pmod(pmod(id.cast("long"), lit(TwoTo31)) * KnuthC, lit(TwoTo32)),
      lit(buckets.toLong)).cast("int")

  /** Append a `split` column: fractions like Seq("train" -> 0.8,
    * "val" -> 0.1, "test" -> 0.1) (must sum to ~1; resolved on a
    * 0-99 bucket grid). */
  def withSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)] = Seq(
                  "train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val bounds = fractions.scanLeft(0)((acc, f) => acc + math.round(f._2 * 100).toInt)
    val b = hashBucket(col(idCol), 100)
    val expr = fractions.zip(bounds.sliding(2).toSeq).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), Seq(lo, hi))) =>
        when(b >= lo && b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Engine-reproducible key for a STRING column: the polynomial rolling
    * hash Σ (acc·31 + codepoint) mod 1e9+7 — plain integer arithmetic any
    * engine replays exactly (DuckDB: list_reduce over string_split; the
    * q70 checksum pattern). UNICODE-TOTAL: both Spark's `split('')`/
    * `ascii` and DuckDB's `string_split('')`/`ascii` iterate code points
    * (not UTF-16 units), so supplementary-plane text keys identically
    * cross-engine (StringKeyUnicodeSpec pins DuckDB-computed constants).
    * Result < 2^31, so it feeds [[hashBucket]] without pre-reduction
    * concerns. Not cryptographic. */
  def stringKey(c: Column): Column =
    aggregate(filter(split(c, ""), ch => ch =!= ""), lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(1000000007L)))

  /** Leakage-safe GROUP-wise split (sklearn GroupShuffleSplit
    * semantics): every row follows its GROUP's bucket, so all documents
    * of one source/domain/author land in the SAME split — row-level
    * splitting leaks near-duplicate content across train/val when a
    * group's documents correlate, which is exactly when dedup-aware
    * evaluation matters. A pure narrow projection over the group
    * column: no shuffle, no group table, reproducible by any engine. */
  def withGroupSplit(df: DataFrame, groupCol: String,
                     fractions: Seq[(String, Double)] = Seq(
                       "train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val bounds = fractions.scanLeft(0)((acc, f) => acc + math.round(f._2 * 100).toInt)
    val b = hashBucket(stringKey(col(groupCol)), 100)
    val expr = fractions.zip(bounds.sliding(2).toSeq).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), Seq(lo, hi))) =>
        when(b >= lo && b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe deterministic k-fold assignment (sklearn GroupKFold
    * made hash-stable): every row follows its GROUP's fold (0..k−1),
    * so exact-dup or correlated content — keyed by content hash,
    * author, URL host — never straddles a fold boundary and k-fold CV
    * never evaluates against its own training near-dups. Unlike
    * sklearn's size-balancing greedy assignment, the hash assignment
    * is stateless and reproducible on any engine/partitioning; fold
    * sizes balance statistically (group-count scale). Same pure
    * narrow-projection shape as [[withGroupSplit]]: no shuffle. */
  def withGroupKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"bad k=$k")
    df.withColumn("fold", hashBucket(stringKey(col(groupCol)), k))
  }

  /** Neyman-optimal stratified allocation (Neyman 1934): how many eval
    * samples to draw from each stratum when the budget is fixed —
    * n_h ∝ N_h·σ_h, the allocation that minimizes the estimator's
    * variance (big AND internally-diverse strata get more; a huge but
    * uniform stratum needs few samples). The derivation every
    * eval-set builder eyeballs, made exact and replayable:
    * per-stratum variance from integer moment sums
    * (N·Σx² − (Σx)² — overflow bound N_h·Σx² < 2⁶³, pre-scale x for
    * more), σ via IEEE sqrt (correctly rounded), the normalizer as an
    * ordered fold over strata sorted by key (the q212 discipline),
    * and the final allocation on a half-up integer grid. Feed the
    * result to the stratified sampler (q69) as per-stratum fractions.
    *
    * Scale shape: one map-side-combined moment aggregate (one row per
    * stratum) + a broadcast normalizer — the corpus is scanned once. */
  def neymanAllocation(df: DataFrame, groupCol: String, valueCol: String,
                       nTotal: Long): DataFrame = {
    val x = col(valueCol).cast("long")
    val stats = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n_h"), sum(x).as("__sx"), sum(x * x).as("__sxx"))
      .withColumn("sigma", sqrt(
        (col("n_h") * col("__sxx") - col("__sx") * col("__sx")).cast("double") /
          (col("n_h") * col("n_h")).cast("double")))
      .withColumn("__w", col("n_h").cast("double") * col("sigma"))
    val z = stats
      .agg(array_sort(collect_list(struct(col("__g"), col("__w")))).as("ps"))
      .select(aggregate(transform(col("ps"), p => p("__w")),
        lit(0.0), (a, b) => a + b).as("__z"))
    stats.crossJoin(broadcast(z))
      .select(col("__g").as(groupCol), col("n_h"), col("sigma"),
        floor(lit(nTotal.toDouble) * col("__w") / col("__z") + 0.5)
          .cast("long").as("alloc"))
  }

  /** Deterministic global shuffle: order the corpus by the seeded stable
    * hash of its id — the reproducible "shuffle the training data" step
    * (same order on any cluster, any partitioning, any engine; a new
    * `seed` gives an independent order). Spark executes the orderBy as
    * range-partition + per-partition sort — the scalable distributed
    * sort, never a single-task collapse. Ties are impossible: the
    * secondary key is the unique id itself.
    *
    * The seed XORs into the id BEFORE the multiply: an additive
    * post-multiply seed would only rotate the key space, leaving the
    * ORDER unchanged (caught by spec) — the multiply must see a
    * different input per seed to yield an independent permutation. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 0L): DataFrame = {
    val mixed = pmod(col(idCol).cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    val key = pmod(mixed * KnuthC, lit(TwoTo32))
    df.withColumn("shuffle_key", key)
      .orderBy(col("shuffle_key"), col(idCol))
  }

  /** Curriculum schedule (Bengio, Louradour, Collobert, Weston, ICML
    * 2009): serve the corpus easiest-first in difficulty SHARDS with a
    * reproducible shuffle inside each shard — the training-loader order
    * that pairs with a per-doc difficulty signal (the natural one is
    * [[NgramLm]]'s integer surprisal). Two deterministic pieces:
    *
    *  - `shard` = bit-length of the integer difficulty (+1; negative
    *    clamps to 0) — the engine's floor-log2 bits idiom: difficulty
    *    distributions spread multiplicatively, so exponentially wider
    *    bands give usable shard populations without any global
    *    rank/quantile pass (a global NTILE is the q86 one-partition
    *    scale-killer this construction exists to avoid);
    *  - `curriculum_rank` = the q92 seeded Knuth order within the
    *    shard, so the interior looks i.i.d. to the model yet replays
    *    identically on any engine, any partitioning, any retry.
    *
    * A loader consumes shards ascending, rows by rank. One
    * `Exchange(shard)` window — shards are plural by construction.
    * Output: input columns + (shard, curriculum_rank). */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: String,
                      seed: Long = 0L): DataFrame = {
    val shard = length(bin(greatest(col(scoreCol).cast("long"), lit(0L)) + 1))
      .cast("int")
    val mixed = pmod(col(idCol).cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    val key = pmod(mixed * KnuthC, lit(TwoTo32))
    df.withColumn("shard", shard)
      .withColumn("curriculum_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(key, col(idCol))).cast("long"))
  }

  /** Deterministic per-group bottom-k sample: the k rows with the
    * smallest seeded stable-hash key in each group — EXACTLY k per group
    * (vs [[stratifiedSample]]'s fractional expectation), uniform because
    * the hash order is unrelated to any data order.
    *
    * This is the distributed, mergeable form of reservoir sampling:
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) (min-k of a
    * union is the min-k of the per-part min-ks), so incremental
    * pipelines keep a standing k-row sample per group and fold each new
    * batch in without rescanning history — the same anti-rescan shape
    * as the engine's incremental views. One shuffle (group window);
    * `sample_rank` is the stable enumeration order for downstream
    * subsampling (rank ≤ m is the same sample with k=m).
    *
    * Arithmetic is [[deterministicShuffle]]'s seeded Knuth hash — plain
    * integer ops any engine replays exactly. */
  def bottomKSample(df: DataFrame, idCol: String, groupCol: String,
                    k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val mixed = pmod(col(idCol).cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    val key = pmod(mixed * KnuthC, lit(TwoTo32))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    df.withColumn("sample_key", key)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic WEIGHTED bottom-k sample — sequential Poisson
    * sampling (Ohlsson, "Sequential Poisson Sampling", J. Official
    * Statistics 14(2), 1998; Rosén's Pareto πps is the same
    * priority-order family): each row draws priority = u/w where u is
    * its seeded uniform hash and w its weight, and the k smallest
    * priorities per group are the sample — inclusion probability
    * approximately proportional to weight (a long doc, a high-quality
    * doc, a heavy token count is proportionally more likely to be
    * drawn), which is the πps sample a token-weighted training mix
    * actually wants.
    *
    * Arithmetic is EXACT INTEGER end to end: u = the [[bottomKSample]]
    * Knuth hash in [0, 2³²), priority = (u · 2²⁰) div w — engine- and
    * partitioning-invariant, SQL-replayable. Mergeable by the same law
    * as bottomK (min-k of a union = min-k of per-part min-ks), so a
    * standing weighted sample folds new batches in at batch cost.
    * Rows with weight ≤ 0 or NULL are excluded (zero weight = never
    * sampled). Weights are capped to 2³⁰ per row (`w` beyond that
    * saturates — priority granularity, not mass, is the limit).
    *
    * One shuffle (group window); ties broken by id for full
    * determinism. */
  def weightedBottomKSample(df: DataFrame, idCol: String, weightCol: String,
                            groupCol: String, k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val mixed = pmod(col(idCol).cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    val u = pmod(mixed * KnuthC, lit(TwoTo32))
    val wgt = least(col(weightCol).cast("long"), lit(1073741824L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("sample_prio").asc, col(idCol).asc)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__u", u)
      .withColumn("__w", wgt)
      .withColumn("sample_prio", expr("(__u * 1048576) div __w"))
      .drop("__u", "__w")
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic PER-ROW importance resampling: each row repeats
    * `weight` times, where weight is a per-row rational in BASIS POINTS
    * (10000 = 1.0×) — the "epochs ∝ quality" training-mix primitive
    * stated at document granularity (a 2.7× doc yields 2 copies plus a
    * deterministic 70% chance of a third), where [[resampleByWeight]]
    * states it per GROUP and [[weightedBottomKSample]] SELECTS without
    * replacement instead of repeating.
    *
    * copies = wBp div 10000, plus 1 when the row's seeded Knuth hash
    * lands under wBp mod 10000 on the 0-9999 grid — all integer
    * arithmetic, so the realized copy count is engine- and
    * partitioning-reproducible (NOT Bernoulli; the same anti-rescan
    * grid as [[resampleByWeight]]). Rows with wBp ≤ 0 or NULL drop.
    * Pure narrow ops (`explode(sequence(...))`) — zero shuffle;
    * `copy_id` (0-based) distinguishes repeats for a downstream
    * [[deterministicShuffle]]. */
  def resampleByRowWeight(df: DataFrame, idCol: String, weightBpCol: String,
                          seed: Long = 0L): DataFrame = {
    val mixed = pmod(col(idCol).cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    val grid = pmod(pmod(mixed * KnuthC, lit(TwoTo32)), lit(10000L))
    df.filter(col(weightBpCol).isNotNull && col(weightBpCol) > 0)
      .withColumn("__wbp", col(weightBpCol).cast("long"))
      .withColumn("__grid", grid)
      .withColumn("__copies", expr("__wbp div 10000") +
        when(col("__grid") < pmod(col("__wbp"), lit(10000L)), 1L).otherwise(0L))
      .filter(col("__copies") > 0) // sequence(0,-1) would DESCEND, not empty
      .withColumn("copy_id", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__wbp", "__grid", "__copies")
  }

  /** Deterministic mixture resampling: repeat or thin rows so each group
    * (source / domain / language) contributes `weight ×` its current
    * rows — the data-mixing step that turns corpus proportions into
    * training proportions, with OVERSAMPLING (weight > 1) expressed as
    * real row repetition the way a training loader consumes it.
    *
    * Weight w gives every row `floor(w)` copies plus one more for a
    * deterministic `frac(w)` share of rows (stable id hash on a 0-9999
    * grid — NOT Bernoulli, so the realized mix survives repartitioning
    * and is engine-reproducible); w < 1 is plain deterministic
    * downsampling. Pure narrow ops — the copy count is a literal CASE
    * over the group column and the copies come from
    * `explode(sequence(...))` — zero shuffle at any scale. `copy_id`
    * distinguishes repeats so a downstream [[deterministicShuffle]]
    * (keyed on id and copy_id) can spread them across the epoch. */
  def resampleByWeight(df: DataFrame, idCol: String, groupCol: String,
                       weights: Map[String, Double],
                       defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "weights must be non-negative")
    def whole(w: Double) = math.floor(w).toLong
    def cut(w: Double) = math.round((w - math.floor(w)) * 10000).toInt
    val sorted = weights.toSeq.sortBy(_._1)
    val base = sorted.foldLeft(lit(whole(defaultWeight))) {
      case (acc, (g, w)) => when(col(groupCol) === g, lit(whole(w))).otherwise(acc)
    }
    val extraCut = sorted.foldLeft(lit(cut(defaultWeight))) {
      case (acc, (g, w)) => when(col(groupCol) === g, lit(cut(w))).otherwise(acc)
    }
    val b = hashBucket(col(idCol), 10000)
    df.withColumn("__repeats",
        base + when(b < extraCut, lit(1L)).otherwise(lit(0L)))
      .filter(col("__repeats") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__repeats") - 1)))
      .drop("__repeats")
  }

  /** Temperature-flattened mixture weights for [[resampleByWeight]]:
    * group g with corpus share p_g gets target share p_g^alpha / Σ p^alpha
    * (alpha = 1 keeps the corpus mix, alpha = 0 equalizes groups, the
    * usual range is 0.3-0.7 — the multilingual-training "sampling
    * temperature"), returned as per-row weights w_g = target/p_g scaled
    * so the expected output row count equals the input's. One
    * count-per-group aggregate reaches the driver (group-cardinality
    * rows); everything downstream is the narrow resample. */
  def temperatureWeights(df: DataFrame, groupCol: String,
                         alpha: Double): Map[String, Double] = {
    require(alpha >= 0, "alpha must be non-negative")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val total = counts.values.sum // integer-valued doubles: exact any order
    // α = ½ rides IEEE sqrt (correctly rounded ⇒ bit-identical in any
    // engine — the oracle-replayable path); other α use pow, whose libm
    // implementations differ in ULPs across engines (driver-side use)
    def flat(x: Double) = if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val q = counts.map { case (g, n) => g -> flat(n / total) }
    // float addition is not associative: fold in sorted-key order so any
    // engine replays the identical normalizer
    val z = q.toSeq.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    counts.map { case (g, n) => g -> (q(g) / z) * total / n }
  }

  /** Deterministic stratified sample: keep a per-stratum fraction of
    * rows, chosen by the stable id hash (NOT `sampleBy`, whose Bernoulli
    * draws depend on partition layout). Fractions are resolved on a
    * 0-9999 bucket grid (0.01% granularity); strata absent from the map
    * fall back to `defaultFraction`. A pure narrow filter: no shuffle,
    * fully pushdown-friendly, reproducible by any engine.
    *
    * Rebalancing a skewed corpus (e.g. downsampling the dominant
    * language before training) is this operator with per-stratum
    * fractions ∝ targetShare/currentShare. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val b = hashBucket(col(idCol), 10000)
    def cut(f: Double) = math.round(f * 10000).toInt
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(cut(defaultFraction))) {
      case (acc, (stratum, f)) => when(col(strataCol) === stratum, lit(cut(f))).otherwise(acc)
    }
    df.filter(b < threshold)
  }
}
