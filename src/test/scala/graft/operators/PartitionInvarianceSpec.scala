package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSuite

/** The round-15 determinism sweep: every new operator's output must be
  * BIT-IDENTICAL under any input partitioning — the property the house
  * exactness discipline (integer/decimal accumulation, sorted-struct
  * folds, pinned constants) exists to guarantee. One randomized corpus,
  * each operator run on coalesce(1) vs repartition(13), full-row
  * string compare. A failure here means an order-dependent double
  * sneaked into an accumulation. */
class PartitionInvarianceSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def inv(name: String)(f: DataFrame => DataFrame)
                 (mk: => DataFrame): Unit = test(s"$name is partitioning-invariant") {
    val base = mk
    val a = f(base.coalesce(1)).collect().map(_.toString).toSeq
    val b = f(base.repartition(13)).collect().map(_.toString).toSeq
    assert(a == b, s"$name diverged under repartition")
    assert(a.nonEmpty, s"$name produced no rows")
  }

  private val rnd = new scala.util.Random(42)

  private def events = (1 to 600).map { i =>
    (i.toLong % 37, s"g${i % 5}", rnd.nextInt(1000).toLong,
      (rnd.nextInt(500) + 1).toLong)
  }.toDF("user", "grp", "v", "w")

  inv("wasserstein1") { df =>
    Drift.wasserstein1(df.filter($"user" % 2 === 0),
      df.filter($"user" % 2 === 1), "v")
  }(events)

  inv("cmh") { df =>
    Experiments.cmh(df.selectExpr("grp", "cast(user % 2 as int) arm",
      "v > 500 as y"), "grp", "arm", "y")
  }(events)

  inv("mcnemar") { df =>
    Experiments.mcnemar(df.selectExpr("v > 300 as a", "w > 250 as b"),
      "a", "b")
  }(events)

  inv("effectSize") { df =>
    Experiments.effectSize(df.selectExpr("grp", "cast(user % 2 as int) arm",
      "cast(v as double) y"), "grp", "arm", "y")
  }(events)

  inv("mdePower") { df =>
    Experiments.mdePower(df.selectExpr("grp", "cast(user % 2 as int) arm",
      "v > 500 as y"), "grp", "arm", "y")
  }(events)

  inv("levene") { df =>
    Variance.levene(df, "grp", "v")
  }(events)

  inv("jackknife ratio") { df =>
    Jackknife.ratio(df.selectExpr("user id", "cast(v as double) y",
      "cast(w as double) x"), "id", "y", "x", groups = 10)
  }(events.groupBy("user").agg(
    org.apache.spark.sql.functions.sum("v").as("v"),
    org.apache.spark.sql.functions.sum("w").as("w"))
    .selectExpr("user", "cast(v as double) v", "cast(w as double) w")
    .toDF("user", "v", "w"))

  inv("weightedQuantiles") { df =>
    ExactQuantile.weightedQuantiles(df, "v", "w",
      Seq((1L, 2L), (9L, 10L)))
  }(events)

  inv("kishEss") { df =>
    Weighting.kishEss(df, "grp", "w")
  }(events)

  inv("confusion") { df =>
    Confusion.multiclass(df.selectExpr("grp t", "concat('g', user % 5) p"),
      "t", "p")
  }(events)

  inv("bhAdjust") { df =>
    MultipleTesting.bhAdjust(
      df.groupBy("grp").agg(
        org.apache.spark.sql.functions.expr(
          "cast(sum(v) % 41 as double) / 10 - 2").as("z")),
      "grp", "z")
  }(events)

  inv("dispersion fano") { df =>
    Dispersion.fano(df.selectExpr("grp", "cast(v % 24 as long) h"),
      "grp", "h")
  }(events)

  inv("zero inflation") { df =>
    Dispersion.zeroInflation(df.selectExpr("grp", "cast(v % 24 as long) h"),
      "grp", "h")
  }(events)

  inv("acf") { df =>
    Autocorr.acf(df.groupBy($"v" % 50).agg(
      org.apache.spark.sql.functions.count("*").cast("double").as("y"))
      .toDF("t", "y"), "t", "y", maxLag = 5)
  }(events)

  inv("ses") { df =>
    Smoothing.ses(df.groupBy($"v" % 50).agg(
      org.apache.spark.sql.functions.count("*").cast("double").as("y"))
      .toDF("t", "y"), "t", "y", alpha = 0.3)
  }(events)

  inv("segmented fit") { df =>
    Segmented.fit(df.selectExpr("cast(v % 40 as double) x",
      "cast(w as double) y"), "x", "y")
  }(events)

  inv("quantile regression profile") { df =>
    QuantileRegression.pinballProfile(
      df.selectExpr("cast(v % 40 + 1 as double) x", "cast(w as double) y"),
      "x", "y")
  }(events)

  inv("lexical diversity") { df =>
    VocabStats.lexicalDiversity(df, "grp", "text")
  }(events.selectExpr("grp",
    "concat('w', v % 23, ' w', w % 17, ' w', user % 11) text"))

  inv("richness") { df =>
    VocabStats.richness(df, "grp", "text")
  }(events.selectExpr("grp",
    "concat('w', v % 23, ' w', w % 17, ' w', user % 11) text"))

  inv("transition entropy") { df =>
    Sequences.transitionEntropy(df, Seq("user"), Seq("v", "w"), "grp")
  }(events)

  inv("energy distance") { df =>
    Drift.energyDistance(df.filter($"user" % 2 === 0),
      df.filter($"user" % 2 === 1), "v")
  }(events)

  inv("upper-tail dependence") { df =>
    Correlation.upperTailDependence(df, "v", "w", 9, 10)
  }(events)

  inv("item cosine") { df =>
    ItemCf.itemCosine(df, "user", "v", topK = 15, minSupport = 2L)
  }(events)

  inv("burrows delta") { df =>
    Stylometry.burrowsDelta(df, "text", "grp", topWords = 8)
  }(events.selectExpr("grp",
    "concat('w', v % 23, ' w', w % 17, ' w', user % 11) text"))
}
