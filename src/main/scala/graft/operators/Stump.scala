package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decision-stump training — the best single (feature, threshold)
  * split by exact Gini impurity: the simplest model the engine can
  * TRAIN end to end relationally, and the unit of real systems
  * (boosting stumps, tree root finding, rule mining's first cut). The
  * curation use is diagnostic: "which single feature best separates
  * kept from dropped documents, and at what value" — an explanation,
  * not just a score.
  *
  * Threshold candidates come from each feature's exact quantile grid
  * ([[ExactQuantile]] ranks — bounded and deterministic, never the
  * corpus's distinct values), so the candidate set is `thresholds` per
  * feature at ANY corpus size. One histogram aggregate per feature
  * bins the corpus against its candidate edges; cumulative counts over
  * the bounded grid give every split's exact (n, pos) cell table in
  * one pass — the classic single-scan split-finding layout
  * (every tree library's histogram trick, done as relational algebra).
  *
  * Selection: minimize weighted Gini ⇔ maximize
  * h = ((posL² + negL²)·nR + (posR² + negR²)·nL) / (nL·nR). Both
  * engines derive h by the SAME single division of exact BIGINTs
  * (IEEE-correctly rounded ⇒ bit-identical), and the argmax
  * tie-breaks on (h desc, feature, threshold) — a total deterministic
  * order, so the trained stump replays exactly. */
object Stump {

  /** One row: the winning split — (feature, threshold, n_left,
    * pos_left, n_right, pos_right, gini). Rows with x ≤ threshold go
    * left. Feature columns must be integral (micro-scale first — the
    * [[ExactQuantile]] house rule); `labelCol` boolean-castable. */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
            thresholds: Int = 16): DataFrame = {
    require(featureCols.nonEmpty && thresholds >= 1, "bad stump config")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(labelCol).isNotNull)
      .select(featureCols.map(f => col(f).cast("long").as(f)) :+
        col(labelCol).cast("boolean").as("__y"): _*)
    val fx = featureCols.map(f => struct(lit(f).as("feature"), col(f).as("__x")))
    val long = base.select(explode(array(fx: _*)).as("__fx"), col("__y"))
      .select(col("__fx.feature").as("feature"), col("__fx.__x").as("__x"),
        col("__y"))
      .filter(col("__x").isNotNull)
    // candidate thresholds: one BATCHED per-feature order-statistic pass
    // (ExactQuantile.groupedRanks — r18: the per-feature globalRanks
    // loop was ~90% of the stump's warm cost at 2 features; the grouped
    // form pays the two-phase job ladder once for ALL features)
    val nOf = long.groupBy(col("feature")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    featureCols.foreach { f =>
      require(nOf.getOrElse(f, 0L) >= 2,
        s"stump: feature $f has ${nOf.getOrElse(f, 0L)} usable rows")
    }
    val ranksOf = featureCols.map { f =>
      val n = nOf(f)
      f -> (1 to thresholds).map(k => (k * n + thresholds) / (thresholds + 1))
        .filter(_ >= 1).distinct.map(_.toLong)
    }.toMap
    val candidates: Seq[(String, Long)] =
      ExactQuantile.groupedRanks(long.select(col("feature"), col("__x")),
          "feature", "__x", ranksOf, lowBits = 8)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq.distinct
    val cand = candidates.toDF("feature", "threshold")
    val tot = long.groupBy(col("feature"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
    val cells = long.join(broadcast(cand), "feature")
      .groupBy(col("feature"), col("threshold"))
      .agg(sum(when(col("__x") <= col("threshold"), 1L).otherwise(0L))
          .as("n_left"),
        sum(when(col("__x") <= col("threshold") && col("__y"), 1L)
          .otherwise(0L)).as("pos_left"))
    val splits = cells.join(tot, "feature")
      .withColumn("n_right", col("n") - col("n_left"))
      .withColumn("pos_right", col("pos") - col("pos_left"))
      .filter(col("n_left") > 0 && col("n_right") > 0) // real splits only
    val negL = col("n_left") - col("pos_left")
    val negR = col("n_right") - col("pos_right")
    // h: one division of exact BIGINT products — bit-identical anywhere
    val h = ((col("pos_left") * col("pos_left") + negL * negL) * col("n_right")
      + (col("pos_right") * col("pos_right") + negR * negR) * col("n_left"))
      .cast("double") / (col("n_left") * col("n_right")).cast("double")
    val giniW = (col("n").cast("double") - h) / col("n").cast("double")
    splits.select(col("feature"), col("threshold"),
        col("n_left"), col("pos_left"), col("n_right"), col("pos_right"),
        h.as("__h"), round(giniW, 6).as("gini"))
      .orderBy(col("__h").desc, col("feature"), col("threshold"))
      .limit(1)
      .drop("__h")
  }
}
