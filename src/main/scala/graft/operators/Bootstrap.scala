package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap confidence intervals — the resampling scheme that
  * actually runs at corpus scale (Chamandy et al. 2012, "Estimating
  * uncertainty for massive data streams": classical bootstrap needs a
  * global n-row resample per replicate; Poisson bootstrap gives every
  * row an INDEPENDENT per-replicate weight ~ Poisson(1), so the whole
  * B-replicate ensemble is one narrow pass — no global state, no
  * coordination). A curator quotes "mean doc length 318 [278, 361]"
  * instead of a bare point estimate before acting on a source
  * difference.
  *
  * Determinism (the q92/q97 seeded-hash discipline): the weight is
  * NOT sampled — u = ((id mod 2³¹) ⊕ (b·1315423911 mod 2³¹)) ·
  * 2654435761 mod 2³² is a fixed engine-portable integer, and the
  * Poisson(1) inverse CDF is applied via precomputed integer
  * thresholds ⌊cdf·2³²⌋ (tail capped at weight 6, mass 8·10⁻⁵ — a
  * DEFINED deterministic scheme, replayable bit-for-bit in SQL, not a
  * stochastic approximation). Replicate means are exact-BIGINT ratios
  * divided once; CI bounds are exact order statistics over the B
  * replicate means (the q73 element-selection idiom — no
  * interpolation arithmetic).
  *
  * Scale shape: the B-fold explode happens MAP-SIDE feeding a
  * partial-combined aggregate, so the shuffle carries groups×B
  * summary rows — never corpus×B. The CI window sorts B rows per
  * group. B and the grid are the cost levers; the corpus is scanned
  * once.
  */
object Bootstrap {

  /** Poisson(1) inverse-CDF thresholds on the 2³² grid: weight =
    * #{t : u ≥ t}, so P(w ≥ k+1) = 1 − cdf(k) exactly on the grid. */
  private val Thresholds: Seq[Long] =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L)

  /** The deterministic per-(row, replicate) weight in 0..6. */
  private def weight(u: Column): Column =
    Thresholds.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)

  /** (group, n, mean, lo, hi): exact point mean plus [loQ, hiQ]
    * percentile bootstrap bounds over `b` replicate means of
    * `valueCol` (integer-valued). `idCol` seeds the weight hash. */
  def poissonCi(df: DataFrame, groupCol: String, valueCol: String,
                idCol: String, b: Int = 200,
                loQ: Double = 0.025, hiQ: Double = 0.975): DataFrame = {
    val u = pmod(
      (col(idCol) % lit(2147483648L))
        .bitwiseXOR(pmod(col("__b") * lit(1315423911L), lit(2147483648L)))
        * lit(2654435761L),
      lit(4294967296L))
    val rep = df
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__x"), col(idCol))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__w", weight(u))
      .groupBy(col("__g"), col("__b"))
      .agg(sum(col("__w")).as("den"), sum(col("__x") * col("__w")).as("num"))
      .filter(col("den") > 0)
      .withColumn("mean_b", col("num").cast("double") / col("den").cast("double"))
    val w = Window.partitionBy(col("__g")).orderBy(col("mean_b"), col("__b"))
    val wg = Window.partitionBy(col("__g"))
    def pick(q: Double) =
      floor(lit(q) * (col("nb") - 1)).cast("long") + 1
    val ci = rep
      .withColumn("rn", row_number().over(w))
      .withColumn("nb", count(lit(1)).over(wg))
      .groupBy(col("__g"))
      .agg(max(when(col("rn") === pick(loQ), col("mean_b"))).as("lo"),
        max(when(col("rn") === pick(hiQ), col("mean_b"))).as("hi"))
    df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("sx"))
      .join(ci, "__g")
      .select(col("__g").as(groupCol), col("n"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean"),
        col("lo"), col("hi"))
  }
}
