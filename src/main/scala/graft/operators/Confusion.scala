package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-class confusion summary — the evaluation block the binary
  * family (q224 threshold P/R, aucPerGroup, q266 gains) cannot give a
  * k-way labeler (lang-id, topic routing, quality tiers): per true
  * class the one-vs-rest precision/recall/F1, plus pooled accuracy
  * (= micro-F1 in single-label classification) and macro-F1 — the
  * average that refuses to let the majority class hide a collapsed
  * minority class (Sokolova & Lapalme 2009).
  *
  * Exactness: the (truth, pred) census is one map-side-combined BIGINT
  * aggregate; tp/fp/fn derive from census sums; every rate is one
  * double division, and macro-F1 folds per-class F1 in CLASS ORDER
  * (the q279 discipline). Classes that never appear as TRUTH get no
  * row (their predictions still count as other classes' fp); empty
  * one-vs-rest denominators yield F1 = 0 for the class, the standard
  * convention, not NULL-poisoned averages.
  *
  * Scale shape: ONE aggregate onto the ≤classes² grid; everything
  * after runs on grid rows. */
object Confusion {

  /** One row per TRUE class: (class, n_true, tp, fp, fn, precision,
    * recall, f1) with (accuracy, macro_f1, n) repeated. */
  def multiclass(df: DataFrame, truthCol: String,
                 predCol: String): DataFrame = {
    // ONE corpus pass: the classes-squared census pins — the by-truth,
    // by-pred and pooled branches otherwise each re-scan; the
    // classes-bounded result re-emits driver-side (pin released)
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      df.filter(col(truthCol).isNotNull && col(predCol).isNotNull)
        .groupBy(col(truthCol).cast("string").as("__t"),
          col(predCol).cast("string").as("__p"))
        .agg(count(lit(1)).as("__n"))
    ) { cells =>
    // the census is materialized, so the count is free — and it is the
    // guard that keeps a continuous predCol/truthCol (cells ≈ n, not
    // classes²) from checkpointing the corpus and OOMing the collect
    require(cells.count() <= Grids.DefaultMaxRows,
      s"multiclass: (truth, pred) census exceeded ${Grids.DefaultMaxRows} " +
        "cells — is a continuous column being used as a class label?")
    val byTruth = cells.groupBy(col("__t"))
      .agg(sum(col("__n")).as("n_true"),
        sum(when(col("__p") === col("__t"), col("__n")).otherwise(0L))
          .as("tp"))
    val byPred = cells.groupBy(col("__p"))
      .agg(sum(col("__n")).as("__npred"))
    val perClass = byTruth
      .join(byPred, col("__t") === col("__p"), "left")
      .na.fill(0L, Seq("__npred"))
      .withColumn("fp", col("__npred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("n_true") > 0,
          col("tp").cast("double") / col("n_true").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
    val pooled = perClass.agg(
      sum(col("n_true")).as("__nn"), sum(col("tp")).as("__tp"),
      count(lit(1)).as("__k"),
      aggregate(
        transform(array_sort(collect_list(struct(col("__t"),
          col("f1").as("v")))), p => p.getField("v")),
        lit(0.0), (acc, x) => acc + x).as("__f1sum"))
    val out = perClass.crossJoin(broadcast(pooled))
      .select(col("__t").as("class"), col("n_true"), col("tp"),
        col("fp"), col("fn"),
        round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"),
        round(col("f1"), 6).as("f1"),
        round(col("__tp").cast("double") / col("__nn").cast("double"), 6)
          .as("accuracy"),
        round(col("__f1sum") / col("__k").cast("double"), 6)
          .as("macro_f1"),
        col("__nn").as("n"))
      .orderBy(col("class"))
    Grids.collectBounded(out, "multiclass class grid")
    }
  }
}
