package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cronbach's α — internal-consistency reliability of a multi-item
  * score (Cronbach 1951): do the k items of a composite (the quality
  * sub-scores q45 aggregates, a rubric's criteria, a judge panel's
  * dimensions) measure ONE underlying thing? The agreement family asks
  * whether RATERS agree ([[Agreement]] κ/α); this asks whether ITEMS
  * cohere — low Cronbach-α means the composite score is averaging
  * unrelated quantities and its threshold gates are arbitrary.
  *
  *   α = k/(k−1) · (1 − Σᵢ var(itemᵢ) / var(Σᵢ itemᵢ))
  *
  * Exactness: population variances from exact decimal sums — per item
  * (Σx, Σx²) and for the subject-total (Σt, Σt²); the n²-scaled
  * numerators n·Σx² − (Σx)² close in the shared DOUBLE domain (each
  * exact sum cast once, then IEEE mult/sub — the [[Regression.ols2]]
  * replay contract: exact decimal products past 38 digits round
  * differently per engine), item-ordered fold, one α expression (the
  * n² factors cancel between numerator and denominator).
  * The design must be COMPLETE (every subject scores every item — the
  * [[Agreement.fleissKappa]] contract): a missing cell silently
  * deflates its item's variance, so incompleteness fails loudly.
  *
  * Scale shape: one (item) map-side-combined aggregate + one
  * subject-keyed aggregate for the totals; output is one row. */
object Reliability {

  /** One row: (n_subjects, k_items, sum_item_var_n2, total_var_n2,
    * alpha) — the *_n2 columns are the exact n²-scaled variance sums
    * (BIGINT-free decimals), carried for auditability. */
  def cronbachAlpha(df: DataFrame, subjectCol: String, itemCol: String,
                    scoreCol: String): DataFrame = {
    val cells = df.filter(col(scoreCol).isNotNull)
      .select(col(subjectCol).as("__s"), col(itemCol).as("__i"),
        col(scoreCol).cast("decimal(18,6)").as("__x"))
    val shape = cells.groupBy(col("__s"))
      .agg(count(lit(1)).as("__rows"), countDistinct(col("__i")).as("__items"))
      .agg(min(col("__rows")).as("lo"), max(col("__rows")).as("hi"),
        min(col("__items")).as("ilo"), max(col("__items")).as("ihi")).head()
    require(shape.getLong(0) == shape.getLong(1) &&
        shape.getLong(2) == shape.getLong(3) &&
        shape.getLong(0) == shape.getLong(2),
      "cronbachAlpha needs a complete design (every subject scores every " +
        s"item once): rows/subject in [${shape.getLong(0)}, ${shape.getLong(1)}], " +
        s"items/subject in [${shape.getLong(2)}, ${shape.getLong(3)}]")
    val k = shape.getLong(0)
    require(k >= 2, s"cronbachAlpha needs >= 2 items, got $k")
    // per-item exact variance numerators: n·Σx² − (Σx)²
    val items = cells.groupBy(col("__i"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).cast("decimal(38,6)").as("__sx"),
        sum(col("__x") * col("__x")).cast("decimal(38,12)").as("__sxx"))
    // item-ordered fold (the q224 discipline): summing the per-item
    // double numerators in an unspecified order would be
    // partitioning-dependent
    val itemVar = items.agg(
      max(col("__n")).as("n"),
      aggregate(transform(array_sort(collect_list(struct(
          col("__i").cast("string").as("i"),
          // moments in the shared DOUBLE domain (the Regression.ols2
          // replay contract): exact-decimal products past 38 digits
          // round differently per engine
          (col("__sxx").cast("double") * col("__n") -
            col("__sx").cast("double") * col("__sx").cast("double"))
            .as("v")))), s => s.getField("v")),
        lit(0.0), (acc, x) => acc + x).as("sum_item_var_n2"))
    val totals = cells.groupBy(col("__s"))
      .agg(sum(col("__x")).cast("decimal(38,6)").as("__t"))
      .agg(count(lit(1)).as("__n2"),
        sum(col("__t")).cast("decimal(38,6)").as("__st"),
        sum(col("__t") * col("__t")).cast("decimal(38,12)").as("__stt"))
      .select((col("__stt").cast("double") * col("__n2") -
        col("__st").cast("double") * col("__st").cast("double"))
        .as("total_var_n2"))
    itemVar.crossJoin(broadcast(totals))
      .select(col("n").as("n_subjects"), lit(k).as("k_items"),
        col("sum_item_var_n2"), col("total_var_n2"),
        when(col("total_var_n2") === 0.0, lit(null).cast("double"))
          .otherwise(lit(k.toDouble / (k - 1)) *
            (lit(1.0) - col("sum_item_var_n2") / col("total_var_n2")))
          .as("alpha"))
  }
}
