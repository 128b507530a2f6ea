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
}
