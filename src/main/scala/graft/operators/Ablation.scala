package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-filter ablation audit — the question a curation reviewer
  * actually asks before shipping a filter battery: not "how much does
  * each filter remove" but "how much does each filter remove THAT
  * NOTHING ELSE CATCHES" (its marginal value), plus the survivor
  * count. A filter whose failures are all caught elsewhere is free to
  * drop; a filter with large unique-failure mass is load-bearing and
  * deserves its own precision review (the Gopher/C4 filter-stack
  * methodology — Rae et al. 2021 §A.2 report exactly these columns).
  *
  * Mechanics: each document reduces to a k-bit FAILURE MASK
  * (bit i = filter i fails; NULL predicate results count as failure —
  * a missing field is not a pass), and ONE map-side-combined census
  * over the ≤2ᵏ masks answers every ablation question exactly:
  * n_failing(i) = Σ masks with bit i, n_unique(i) = count(mask = 2ⁱ),
  * survivors = count(mask = 0), failure-multiplicity histogram from
  * popcount.
  *
  * Output: one row per filter (filter, n_failing, n_unique_failures,
  * frac_failing) with (n_docs, n_survivors) repeated — the
  * psiFromCells shape. All exact integers; the fraction is the only
  * double (6-dp).
  *
  * Scale shape: ONE corpus pass (the predicates are one codegen'd
  * projection) onto the ≤2ᵏ mask census; everything after runs on
  * census rows re-emitted through the [[Grids]] guard. k ≤ 12. */
object Ablation {

  def filterAblation(df: DataFrame,
                     filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty && filters.size <= 12,
      s"filterAblation: ${filters.size} filters outside [1, 12]")
    require(filters.map(_._1).distinct.size == filters.size,
      "filterAblation: duplicate filter names")
    val mask = filters.zipWithIndex.map { case ((_, pred), i) =>
      // NULL predicate result = failure: a missing field is not a pass
      when(coalesce(pred, lit(true)), lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      df.groupBy(mask.as("__mask")).agg(count(lit(1)).as("__c"))
    ) { census =>
      val cells = Grids.collectBounded(census, "filterAblation mask census",
        maxRows = 1 << 12)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nDocs = cells.map(_._2).sum
      require(nDocs > 0, "filterAblation: empty corpus")
      val survivors = cells.filter(_._1 == 0L).map(_._2).sum
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.types.{StructType, StructField,
        StringType, LongType, DoubleType}
      val rows = filters.zipWithIndex.map { case ((name, _), i) =>
        val bit = 1L << i
        val failing = cells.filter(c => (c._1 & bit) != 0).map(_._2).sum
        val unique = cells.filter(_._1 == bit).map(_._2).sum
        org.apache.spark.sql.Row(name, failing, unique,
          failing.toDouble / nDocs.toDouble, nDocs, survivors)
      }
      spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("filter", StringType),
        StructField("n_failing", LongType),
        StructField("n_unique_failures", LongType),
        StructField("frac_failing", DoubleType),
        StructField("n_docs", LongType),
        StructField("n_survivors", LongType))))
        .select(col("filter"), col("n_failing"),
          col("n_unique_failures"),
          round(col("frac_failing"), 6).as("frac_failing"),
          col("n_docs"), col("n_survivors"))
        .orderBy(col("filter"))
    }
  }
}
