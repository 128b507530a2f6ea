package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL order statistics at corpus scale — the two-phase
  * bucket-then-select construction every PLANS audit points at when a
  * global sort or global row window would funnel one partition (the
  * q86 trap), now a first-class operator instead of a remedy note.
  *
  * Phase 1 (one scan): map-side-combined counts per COARSE BUCKET
  * (value >> `lowBits` — an exact integer shift, ≈ range/2^lowBits
  * buckets), cumulated on the bounded bucket grid to locate, for each
  * requested rank, the bucket containing it and the rank REMAINING
  * inside that bucket. Phase 2 (one scan): only rows in located
  * buckets survive the pushed-down filter; an exact per-bucket
  * value-grid cumulation selects the value at the residual rank. No
  * global sort, no global row window, no sampling — both phases are
  * map-side-combined aggregates plus grid-sized windows.
  *
  * Contract: integer values (cast/scale first — the house rule for
  * exact rank arithmetic); `lowBits` trades phase-2 selectivity
  * against phase-1 grid size (buckets ≈ value_range / 2^lowBits;
  * phase-2 reads ≈ requested_ranks × N/buckets rows under uniform
  * spread — pick lowBits so both are comfortable; the DEFAULT 8 makes
  * the grid 2^56-safe for any long range while phase 2 reads ~1/2^8
  * of a uniform corpus per rank). Ranks are 1-based; rank > N fails
  * loudly rather than clamping.
  *
  * vs the alternatives: `percentile` (exact, but per-distinct-value
  * aggregation state — unbounded on continuous data),
  * `percentile_approx` (bounded state, NOT exact), global
  * `row_number` (exact, one-partition funnel). This is exact AND
  * bounded-state AND distributed. */
object ExactQuantile {

  /** Two-level distributed prefix sum over a (sparse) coarse-bucket
    * histogram: adds exact cumulative bounds __hi/__lo to a
    * (groupCols…, __b, __c) frame.
    *
    * The r18 advisor finding this replaces: a single
    * `Window.orderBy(__b)` cumulation funnels EVERY populated bucket
    * through one task — trivial for token lengths, but a wide integer
    * domain (bytes, cents over 1e12) makes that millions of rows in one
    * window. Standard two-level scan instead:
    *   1. per SUPER-bucket (__b >> superBits) totals — a map-side
    *      combined aggregate, 2^superBits× smaller than the grid;
    *   2. EXCLUSIVE prefix sum over the super totals (a window over the
    *      super grid — span/2^(lowBits+superBits) rows, e.g. ≤ 60k for
    *      a 1e12 value span at the defaults, vs millions of buckets);
    *   3. per-bucket cumsum WITHIN each super-bucket (partitioned
    *      window — parallel across supers) plus the broadcast offset.
    * Integer sums at every level — bit-identical to the single-window
    * form on any partitioning (spec-asserted).
    *
    * Honest cap: a domain sparse over the FULL 64-bit range could
    * populate one bucket per super (offsets ~ bucket count again) —
    * raise lowBits/superBits for such domains; at the defaults the
    * offsets relation stays broadcast-sized for any span ≤ 2^40. */
  private[operators] def cumulateBuckets(hist: DataFrame,
                                         groupCols: Seq[String],
                                         superBits: Int = 16): DataFrame = {
    val gcols = groupCols.map(col)
    val withSb = hist.withColumn("__sb", shiftright(col("__b"), superBits))
    val superTotals = withSb.groupBy((gcols :+ col("__sb")): _*)
      .agg(sum(col("__c")).as("__sc"))
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = superTotals
      .withColumn("__off", coalesce(sum(col("__sc")).over(wOff), lit(0L)))
      .select((gcols :+ col("__sb") :+ col("__off")): _*)
    val wIn = Window.partitionBy((gcols :+ col("__sb")): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSb.join(broadcast(offsets), groupCols :+ "__sb")
      .withColumn("__hi", sum(col("__c")).over(wIn) + col("__off"))
      .withColumn("__lo", col("__hi") - col("__c"))
      .drop("__sb", "__off")
  }

  /** (rank, value) for each requested 1-based global rank over
    * `valueCol` (NULLs excluded). */
  def globalRanks(df: DataFrame, valueCol: String, ranks: Seq[Long],
                  lowBits: Int = 8): DataFrame = {
    require(ranks.nonEmpty, "need at least one rank")
    require(ranks.forall(_ >= 1), s"ranks are 1-based, got ${ranks.min}")
    require(lowBits >= 0 && lowBits <= 40, s"bad lowBits=$lowBits")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    // phase 1: coarse-bucket histogram (grid-bounded), cumulative ranks
    // via the two-level scan (no one-task funnel on wide domains)
    val hist = vals.groupBy(shiftright(col("__v"), lowBits).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val cum = cumulateBuckets(hist, Nil)
    val rdf = ranks.distinct.toDF("rank")
    // locate each rank's bucket + residual rank within the bucket
    val located = cum.join(broadcast(rdf),
        col("rank") > col("__lo") && col("rank") <= col("__hi"))
      .select(col("rank"), col("__b"), (col("rank") - col("__lo")).as("__rr"))
    val total = cum.agg(max(col("__hi"))).head()
    val n = if (total.isNullAt(0)) 0L else total.getLong(0)
    require(ranks.forall(_ <= n),
      s"rank ${ranks.max} exceeds the ${n}-row non-null population")
    // phase 2: exact selection inside located buckets only. The bucket
    // ids collect to the driver (bounded by |ranks| — the audited
    // bounded-collect family) and become LITERAL RANGE predicates on
    // the raw value column — plain >=/<= comparisons genuinely push to
    // the parquet scan (PushedFilters: Or(And(GtEq, LtEq)…)), so
    // min/max row-group stats prune unlocated buckets' IO; a broadcast
    // join (or a predicate on the shifted expression) would not
    val width = 1L << lowBits
    val bucketIds = located.select(col("__b")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val inBuckets = bucketIds
      .map(b => col("__v") >= b * width && col("__v") <= b * width + (width - 1))
      .reduce(_ || _)
    val picked = vals
      .filter(inBuckets)
      .withColumn("__b", shiftright(col("__v"), lowBits))
      .groupBy(col("__b"), col("__v")).agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gridded = picked.withColumn("__vhi", sum(col("__c")).over(wv))
      .withColumn("__vlo", col("__vhi") - col("__c"))
    located.join(gridded, Seq("__b"))
      .filter(col("__rr") > col("__vlo") && col("__rr") <= col("__vhi"))
      .select(col("rank"), col("__v").as("value"))
  }

  /** Per-GROUP exact order statistics in ONE two-phase pass — the
    * batched form of [[globalRanks]] for k features/groups. A caller
    * that loops `globalRanks` per feature pays the full job ladder
    * (histogram, totals, bucket collect, selection) k times over the
    * same corpus; this form pays it ONCE with the group key riding
    * every stage (the r18 q263 finding: 2 features × globalRanks was
    * ~90% of the stump's warm cost). Returns (group, rank, value) —
    * one row per requested (group, rank).
    *
    * Same contract as [[globalRanks]]: integral values, 1-based ranks,
    * rank > group population fails loudly, and a group in `ranksOf`
    * absent from the data fails loudly. */
  def groupedRanks(df: DataFrame, groupCol: String, valueCol: String,
                   ranksOf: Map[String, Seq[Long]],
                   lowBits: Int = 8): DataFrame = {
    require(ranksOf.nonEmpty && ranksOf.values.forall(_.nonEmpty),
      "need at least one rank per group")
    require(ranksOf.values.flatten.forall(_ >= 1),
      s"ranks are 1-based, got ${ranksOf.values.flatten.min}")
    require(lowBits >= 0 && lowBits <= 40, s"bad lowBits=$lowBits")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    // phase 1: per-group coarse histogram, cumulated with the two-level
    // scan (parallel across groups AND across super-buckets within a
    // group — one wide-domain group can no longer funnel one task)
    val hist = vals
      .groupBy(col("__g"), shiftright(col("__v"), lowBits).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val cum = cumulateBuckets(hist, Seq("__g"))
    val rdf = ranksOf.toSeq
      .flatMap { case (g, rs) => rs.distinct.map(r => (g, r)) }
      .toDF("__rg", "rank")
    // ONE phase-1 action: the located rows collect (bounded by Σ|ranks|
    // — the audited bounded-collect family) and double as the
    // population check — a rank beyond its group's population (or a
    // group with no rows) simply fails to locate, and the missing
    // (group, rank) pairs name themselves in the refusal. The collected
    // rows then drive phase 2 as LITERALS, so no later job recomputes
    // the histogram.
    val locRows = cum.join(broadcast(rdf),
        col("__g") === col("__rg") &&
          col("rank") > col("__lo") && col("rank") <= col("__hi"))
      .select(col("__g"), col("rank"), col("__b"),
        (col("rank") - col("__lo")).as("__rr"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val foundPairs = locRows.map(t => (t._1, t._2)).toSet
    val missing = ranksOf.toSeq.flatMap { case (g, rs) =>
      rs.distinct.collect { case r if !foundPairs((g, r)) => (g, r) } }
    require(missing.isEmpty,
      "groupedRanks: rank beyond the group's non-null population (or " +
        s"group absent from the data): ${missing.mkString(", ")}")
    val located = locRows.toSeq.toDF("__g", "rank", "__b", "__rr")
    // phase 2: located (group, bucket) pairs become literal predicates
    val width = 1L << lowBits
    val pairs = locRows.map(t => (t._1, t._3)).distinct
    val inBuckets = pairs.groupBy(_._1).map { case (g, bs) =>
      col("__g") === g && bs.map(_._2).distinct
        .map(b => col("__v") >= b * width && col("__v") <= b * width + (width - 1))
        .reduce(_ || _)
    }.reduce(_ || _)
    val picked = vals.filter(inBuckets)
      .withColumn("__b", shiftright(col("__v"), lowBits))
      .groupBy(col("__g"), col("__b"), col("__v")).agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gridded = picked.withColumn("__vhi", sum(col("__c")).over(wv))
      .withColumn("__vlo", col("__vhi") - col("__c"))
    located.join(gridded, Seq("__g", "__b"))
      .filter(col("__rr") > col("__vlo") && col("__rr") <= col("__vhi"))
      .select(col("__g").as(groupCol), col("rank"), col("__v").as("value"))
  }

  /** Distribution-free confidence interval for the median (the
    * order-statistic / binomial construction — Hahn & Meeker 1991
    * §5.2, normal-approximated ranks): the UNCERTAINTY readout the
    * point medians (q233/q308) ship without. No distributional
    * assumption: the interval is two exact order statistics at
    *
    *   l = max(1, ⌈n/2 − z·√n/2⌉),  u = min(n, ⌊n/2 + 1 + z·√n/2⌋)
    *
    * (z pinned, default two-sided 95%). Exactness: n and the three
    * selected values are exact ([[globalRanks]]); the rank formulas
    * are one double expression both engines compute identically
    * before the integer floor/ceil. One row: (n, median, ci_lo,
    * ci_hi, rank_lo, rank_hi, z).
    *
    * Scale shape: [[globalRanks]]'s two-phase selection — no global
    * sort; one histogram pass + literal-range bucket probes. */
  def medianCi(df: DataFrame, valueCol: String,
               z: Double = 1.959964): DataFrame = {
    require(z > 0, s"medianCi: z=$z")
    val spark = df.sparkSession
    val n = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull).count()
    require(n >= 10, s"medianCi: $n rows (need >= 10)")
    val half = z * math.sqrt(n.toDouble) / 2.0
    val l = math.max(1L, math.ceil(n.toDouble / 2.0 - half).toLong)
    val u = math.min(n, math.floor(n.toDouble / 2.0 + 1.0 + half).toLong)
    val m = (n + 1) / 2
    val got = globalRanks(df, valueCol, Seq(l, m, u).distinct)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.range(1).select(lit(n).as("n"), lit(got(m)).as("median"),
      lit(got(l)).as("ci_lo"), lit(got(u)).as("ci_hi"),
      lit(l).as("rank_lo"), lit(u).as("rank_hi"), lit(z).as("z"))
  }

  /** Convenience: exact quantiles at q = num/den (the ⌈q·N⌉-rank
    * definition — no interpolation, engine-replayable): returns
    * (q_num, q_den, rank, value). */
  def globalQuantiles(df: DataFrame, valueCol: String,
                      quantiles: Seq[(Long, Long)],
                      lowBits: Int = 8): DataFrame = {
    require(quantiles.forall { case (a, b) => a >= 1 && a <= b && b >= 1 },
      "quantiles must be rationals in (0, 1]")
    val n = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull).count()
    require(n > 0, "empty population")
    val withRanks = quantiles.map { case (a, b) => (a, b, (a * n + b - 1) / b) }
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = withRanks.toDF("q_num", "q_den", "rank")
    globalRanks(df, valueCol, withRanks.map(_._3), lowBits)
      .join(broadcast(qdf), "rank")
      .select(col("q_num"), col("q_den"), col("rank"), col("value"))
  }

  /** WEIGHTED exact quantiles — the "median document BY TOKEN MASS"
    * machinery [[globalRanks]] cannot express: half your documents
    * being short is a different statement from half your TOKENS living
    * in short documents, and mixture/packing decisions weight by mass,
    * not by row. Same two-phase shape with Σweight in place of count:
    * the answer for rational q = num/den is the smallest value whose
    * cumulative weight reaches ⌈q·W⌉ (W = total weight; no
    * interpolation — engine-replayable).
    *
    * `weightCol` must be a positive integral weight (tokens, bytes,
    * cents — the house integer-domain rule; zero/negative weights are
    * rejected loudly, they silently corrupt the cumulative ranks).
    * Exactness: bucket and in-bucket cumulative weights are exact
    * BIGINT sums; no float anywhere. One coarse histogram pass + one
    * located-bucket pass, both map-side combined. */
  def weightedQuantiles(df: DataFrame, valueCol: String, weightCol: String,
                        quantiles: Seq[(Long, Long)],
                        lowBits: Int = 8): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (a, b) => a >= 1 && a <= b && b >= 1 },
      "quantiles must be rationals in (0, 1]")
    require(lowBits >= 0 && lowBits <= 40, s"bad lowBits=$lowBits")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("__v"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull)
    val bad = vals.filter(col("__w") <= 0)
    require(bad.isEmpty,
      "weightedQuantiles: non-positive weights — weights must be " +
        "positive integers (tokens, bytes, cents)")
    val hist = vals.groupBy(shiftright(col("__v"), lowBits).as("__b"))
      .agg(sum(col("__w")).as("__c"))
    val cum = cumulateBuckets(hist, Nil)
    val totalRow = cum.agg(max(col("__hi"))).head()
    require(!totalRow.isNullAt(0), "weightedQuantiles: empty population")
    val wTot = totalRow.getLong(0)
    val withRanks = quantiles.map { case (a, b) =>
      (a, b, (a * wTot + b - 1) / b) }
    val rdf = withRanks.map(_._3).distinct.toDF("rank")
    val located = cum.join(broadcast(rdf),
        col("rank") > col("__lo") && col("rank") <= col("__hi"))
      .select(col("rank"), col("__b"),
        (col("rank") - col("__lo")).as("__rr"))
    val width = 1L << lowBits
    val bucketIds = located.select(col("__b")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val inBuckets = bucketIds
      .map(b => col("__v") >= b * width && col("__v") <= b * width + (width - 1))
      .reduce(_ || _)
    val picked = vals.filter(inBuckets)
      .withColumn("__b", shiftright(col("__v"), lowBits))
      .groupBy(col("__b"), col("__v")).agg(sum(col("__w")).as("__c"))
    val wv = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gridded = picked.withColumn("__vhi", sum(col("__c")).over(wv))
      .withColumn("__vlo", col("__vhi") - col("__c"))
    val qdf = withRanks.toDF("q_num", "q_den", "rank")
    located.join(gridded, Seq("__b"))
      .filter(col("__rr") > col("__vlo") && col("__rr") <= col("__vhi"))
      .select(col("rank"), col("__v").as("value"))
      .join(broadcast(qdf), "rank")
      .select(col("q_num"), col("q_den"), col("rank"), col("value"),
        lit(wTot).as("total_weight"))
      .orderBy(col("q_num"), col("q_den"))
  }
}
