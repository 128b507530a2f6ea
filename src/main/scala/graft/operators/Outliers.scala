package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space outlier mining: the rows farthest from their group's
  * centroid — the "does this example belong to its class" cleanup pass
  * of training-data curation (mislabeled rows, embedding-model garbage,
  * and adversarial injects all surface as centroid outliers).
  *
  * Exactness without a division: the centroid is mean = S/n, but
  * comparing ‖x − S/n‖² ranks identically to ‖n·x − S‖² (scale by n²),
  * and the latter is pure integer arithmetic once inputs are floored
  * onto a 2^-gridBits grid (an exponent shift — exact for any double).
  * Integer sums are associative, so the score is bit-identical across
  * partitionings AND engines — the same exact-face/serve-face split as
  * [[Pooling.sumPoolLong]] vs [[Pooling.meanPool]].
  *
  * Scale shape: ONE corpus pass for the per-group sum vectors (typed
  * partial aggregate, dense (dims, n) buffer per (group, task)); one
  * broadcast join of the group-cardinality centroid table back onto the
  * corpus; a top-m-per-group window over scores. Overflow bound: with
  * |x| < 1, the summed score is < 4·n²·dims·2^(2·gridBits); gridBits
  * is the scale lever — 14 holds to ~11k rows/group at 64 dims, 8
  * holds to ~360M rows/group (the grid only quantizes the RANKING
  * resolution, not the data).
  */
object Outliers {

  /** @return (groupCol, idCol, d2, rnk) for the `m` rows per group with
    * the largest exact scaled squared centroid distance d2 = ‖n·x − S‖²
    * on the 2^-gridBits grid; rnk 1 = farthest, ties by idCol. */
  def topByCentroidDistance(df: DataFrame, groupCol: String, vecCol: String,
                            idCol: String, m: Int, gridBits: Int = 14): DataFrame = {
    require(m > 0 && gridBits >= 1 && gridBits <= 20, s"bad m=$m gridBits=$gridBits")
    val scale = 1L << gridBits
    val quantized = df.select(col(groupCol), col(idCol),
      transform(col(vecCol), x => floor(x.cast("double") * lit(scale)).cast("long")).as("__q"))
    val sums = Pooling.sumPoolLong(quantized, Seq(groupCol), "__q", outCol = "__s")
    val scored = quantized
      .join(broadcast(sums), Seq(groupCol))
      .withColumn("d2", aggregate(
        zip_with(col("__q"), col("__s"), (x, s) => {
          val d: Column = col("n") * x - s
          d * d
        }),
        lit(0L), (acc, v) => acc + v))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("d2").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= m)
      .select(col(groupCol), col(idCol), col("d2"), col("rnk"))
  }

  /** Hill plot — the heavy-tail INDEX the moment-based audits (q294
    * Fano, q301 zero-inflation) cannot give: for a Pareto-ish tail
    * P(X > x) ~ x^(−α), the Hill estimator over the top-k order
    * statistics (Hill 1975)
    *
    *   α̂(k) = k / Σ_{i=1..k} ln(x₍ᵢ₎ / x₍ₖ₊₁₎)
    *
    * read across a k-GRID (the standard Hill plot: a stable plateau =
    * a trustworthy α; α < 2 means infinite variance and every
    * mean-based dashboard number is noise).
    *
    * Exactness: the top-(maxK+1) values are one exact TakeOrdered by
    * value (ties at any boundary carry equal values, so the ln terms
    * — and therefore every partial sum — are order-invariant); the
    * per-k folds run in rank order driver-side (the q279 discipline);
    * ln is the q321-precedent libm call, 6-dp at output. α̂ is NULL at
    * a k whose top values all tie the threshold (zero log-sum).
    *
    * Scale shape: one TakeOrderedAndProject over the corpus (maxK+1
    * rows to the driver), O(maxK) folds. Values must be positive
    * integers (cents, chars, tokens). */
  def hillPlot(df: DataFrame, valueCol: String, kGrid: Seq[Int]):
      DataFrame = {
    require(kGrid.nonEmpty && kGrid == kGrid.sorted &&
      kGrid.distinct == kGrid && kGrid.head >= 2,
      "hillPlot: kGrid must be ascending distinct ints >= 2")
    val maxK = kGrid.last
    require(maxK <= 4096, s"hillPlot: maxK=$maxK exceeds 4096")
    val spark = df.sparkSession
    val top = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .orderBy(col("__v").desc).limit(maxK + 1)
      .collect().map(_.getLong(0))
    require(top.length >= maxK + 1,
      s"hillPlot: only ${top.length} values for maxK=$maxK (need " +
        s"${maxK + 1})")
    require(top(maxK) > 0,
      "hillPlot: non-positive values inside the tail window — " +
        "pre-filter or shift first")
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField,
      LongType, DoubleType}
    val rows = kGrid.map { k =>
      val thr = top(k) // x_(k+1), 0-indexed
      var s = 0.0
      var i = 0
      while (i < k) {
        s += math.log(top(i).toDouble / thr.toDouble)
        i += 1
      }
      val alpha: java.lang.Double =
        if (s == 0.0) null else Double.box(k.toDouble / s)
      org.apache.spark.sql.Row(k.toLong, top(k - 1), thr, alpha)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("k", LongType),
      StructField("x_k", LongType),
      StructField("threshold", LongType),
      StructField("alpha", DoubleType))))
      .select(col("k"), col("x_k"), col("threshold"),
        round(col("alpha"), 6).as("alpha"))
      .orderBy(col("k"))
  }
}
