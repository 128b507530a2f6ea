package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delete-one-group jackknife for ratio metrics — the variance
  * machinery ratio KPIs actually need: revenue-per-session,
  * tokens-per-document, clicks-per-view are RATIOS of sums, whose
  * naive per-unit variance is wrong because numerator and denominator
  * covary. The grouped (delete-one-block) jackknife is the standard
  * production answer (Efron & Stein 1981; the "delete-one bucket"
  * scheme every large A/B platform runs): split units into G hash
  * buckets, recompute the ratio leaving each bucket out, and
  *
  *   se² = (G−1)/G · Σ_g (R₍g₎ − R̄)²
  *
  * Exactness: per-bucket numerator/denominator sums are exact DECIMAL
  * aggregates (one map-side-combined pass); every R₍g₎ is one double
  * division of exact totals, and the mean/variance of the G
  * leave-one-out ratios fold in BUCKET ORDER via the sorted-list fold
  * (the q279 discipline). Output: one row per bucket (bucket, sx, sy,
  * r_del) with the pooled (r_hat, jk_se, groups) repeated — the
  * psiFromCells attribution shape.
  *
  * Scale shape: ONE aggregate onto the ≤G bucket grid; everything
  * after runs on G rows. The denominator must be nonzero overall AND
  * after every deletion — a bucket holding ALL the denominator mass
  * fails loudly. */
object Jackknife {

  /** yCol/xCol ratio with `groups` hash buckets of `idCol`. */
  def ratio(df: DataFrame, idCol: String, yCol: String, xCol: String,
            groups: Int = 20): DataFrame = {
    require(groups >= 2 && groups <= 1000, s"bad groups=$groups")
    // ONE corpus pass: the bucket cells pin (≤groups rows) — the naive
    // plan re-derived them in EIGHT branches (totals, deletions, the
    // degeneracy check, both folds, the mean join, the final select);
    // the bounded result re-emits driver-side so the pin releases
    // before returning
    val spark = df.sparkSession
    Pinned.withCheckpoint(df
      .filter(col(idCol).isNotNull && col(yCol).isNotNull &&
        col(xCol).isNotNull)
      .groupBy(Splits.hashBucket(col(idCol), groups).as("bucket"))
      .agg(sum(col(yCol).cast("decimal(18,6)")).cast("decimal(38,12)")
          .as("sy"),
        sum(col(xCol).cast("decimal(18,6)")).cast("decimal(38,12)")
          .as("sx"))
    ) { cells =>
    val tot = cells.agg(sum(col("sy")).cast("decimal(38,12)").as("__ty"),
      sum(col("sx")).cast("decimal(38,12)").as("__tx"))
    val withDel = cells.crossJoin(broadcast(tot))
      .withColumn("r_del",
        (col("__ty") - col("sy")).cast("double") /
          (col("__tx") - col("sx")).cast("double"))
    val degenerate = withDel
      .filter((col("__tx") - col("sx")) === 0 || col("__tx") === 0)
    require(degenerate.isEmpty,
      "jackknife: a deletion empties the denominator — fewer groups or " +
        "more data")
    def foldSorted(v: org.apache.spark.sql.Column) = aggregate(
      transform(array_sort(collect_list(struct(col("bucket"), v))),
        s => s.getField("col2")),
      lit(0.0), (acc, x) => acc + x)
    val g = withDel.agg(count(lit(1)).as("__g"),
      foldSorted(col("r_del").as("col2")).as("__sr"))
    val withMean = withDel.crossJoin(broadcast(g))
      .withColumn("__mean", col("__sr") / col("__g"))
    val varSum = withMean.agg(aggregate(
      transform(array_sort(collect_list(struct(col("bucket"),
        ((col("r_del") - col("__mean")) *
          (col("r_del") - col("__mean"))).as("col2")))),
        s => s.getField("col2")),
      lit(0.0), (acc, x) => acc + x).as("__sv"))
    val out = withMean.crossJoin(broadcast(varSum))
      .select(col("bucket"), col("sx").cast("double").as("sx"),
        col("sy").cast("double").as("sy"),
        round(col("r_del"), 6).as("r_del"),
        round(col("__ty").cast("double") / col("__tx").cast("double"), 6)
          .as("r_hat"),
        round(sqrt((col("__g") - 1).cast("double") / col("__g") *
          col("__sv")), 6).as("jk_se"),
        col("__g").as("groups"))
      .orderBy(col("bucket"))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.collect().toSeq.asJava, out.schema)
    }
  }
}
