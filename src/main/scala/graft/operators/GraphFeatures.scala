package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-prediction features over a bipartite affiliation graph — the
  * classic topological predictors (Liben-Nowell & Kleinberg 2003) for
  * left-node pairs through their shared right-neighbors: common
  * neighbors |Γ(a)∩Γ(b)|, Adamic–Adar Σ 1/ln(deg(z)) over the shared
  * z (rare shared affiliations weigh more), and preferential
  * attachment deg(a)·deg(b). The FEATURE half of the link-prediction
  * training-data story whose LABEL half is
  * [[NegativeSampling.labeledPairs]] — together they emit the
  * (features, label) table a ranker trains on, with no model in the
  * loop.
  *
  * Exactness: counts and degrees are exact integers; Adamic–Adar sums
  * 1/ln(d_z) doubles in SORTED shared-neighbor order (the fixed-fold
  * rule), each term one correctly-rounded division of a log — the
  * q65 ln-parity class, rounded by the caller for gating. Shared
  * neighbors with degree 1 would divide by ln(1) = 0: they contribute
  * NOTHING to AA by convention here (a degree-1 affiliation connects
  * no pair; excluded from the sum rather than yielding ∞).
  *
  * Scale shape: the candidate pairs are GIVEN (never enumerated here —
  * the caller's sampler bounds them); features come from joining each
  * side's affiliation list (two hash joins) + one shared-neighbor
  * aggregate whose width is bounded by the smaller affiliation list;
  * degree tables are metadata-scale. Extra pair columns (labels)
  * carry through untouched. */
object GraphFeatures {

  /** For `pairs` (aCol, bCol, extra...) over bipartite `edges`
    * (leftCol, rightCol): pairs' columns + (cn, aa, pa). */
  def affiliationFeatures(pairs: DataFrame, aCol: String, bCol: String,
                          edges: DataFrame, leftCol: String,
                          rightCol: String): DataFrame = {
    val extras = pairs.columns.toSeq.filterNot(c => c == aCol || c == bCol)
    require(!Seq("cn", "aa", "pa", "__a", "__b").exists(extras.contains),
      "pairs may not already carry cn/aa/pa or __-prefixed working columns")
    val e = edges.select(col(leftCol).cast("long").as("__l"),
      col(rightCol).cast("long").as("__r")).distinct()
    val degL = e.groupBy(col("__l")).agg(count(lit(1)).as("__d"))
    val degR = e.groupBy(col("__r")).agg(count(lit(1)).as("__dr"))
    val p0 = pairs
      .withColumn("__a", col(aCol).cast("long"))
      .withColumn("__b", col(bCol).cast("long"))
    val shared = p0.select(col("__a"), col("__b")).distinct()
      .join(e.withColumnRenamed("__l", "__a"), "__a")
      .join(e.select(col("__l").as("__b"), col("__r")), Seq("__b", "__r"))
      .join(degR, "__r")
    val feats = shared
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("cn"),
        array_sort(collect_list(struct(col("__r"),
          when(col("__dr") > 1, lit(1.0) / log(col("__dr").cast("double")))
            .otherwise(lit(0.0)).as("__t")))).as("__ps"))
      .select(col("__a"), col("__b"), col("cn"),
        aggregate(expr("transform(__ps, p -> p.__t)"), lit(0.0),
          (acc, x) => acc + x).as("aa"))
    // degrees join LEFT: the pairs are GIVEN — an endpoint with no
    // edges has deg 0 (cn=0, aa=0, pa=0), it does not silently drop
    // the pair from the output
    p0.join(feats, Seq("__a", "__b"), "left")
      .join(degL.withColumnRenamed("__l", "__a").withColumnRenamed("__d", "__da"),
        Seq("__a"), "left")
      .join(degL.withColumnRenamed("__l", "__b").withColumnRenamed("__d", "__db"),
        Seq("__b"), "left")
      .select(col(aCol) +: col(bCol) +: extras.map(col) ++: Seq(
        coalesce(col("cn"), lit(0L)).as("cn"),
        coalesce(col("aa"), lit(0.0)).as("aa"),
        (coalesce(col("__da"), lit(0L)) * coalesce(col("__db"), lit(0L))).as("pa")): _*)
  }
}
