package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ExactQuantileSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed ranks on 1..1000 (values spread across many buckets)") {
    val df = (1L to 1000L).toDF("v")
    val got = ExactQuantile.globalRanks(df, "v", Seq(1L, 250L, 500L, 999L, 1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 250L -> 250L, 500L -> 500L, 999L -> 999L, 1000L -> 1000L))
  }

  test("matches a brute-force sort on duplicate-heavy and negative data") {
    val vals = (1L to 2000L).map(i => (i * 37 % 97) - 48)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    val ranks = Seq(1L, 7L, 500L, 1999L, 2000L)
    val got = ExactQuantile.globalRanks(df, "v", ranks, lowBits = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ranks.foreach(r => assert(got(r) == sorted((r - 1).toInt), s"rank $r"))
  }

  test("quantile ranks use the ceil(q*N) definition") {
    val df = (1L to 10L).toDF("v")
    val got = ExactQuantile.globalQuantiles(df, "v", Seq((1L, 4L), (1L, 2L), (9L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got((1L, 4L)) == ((3L, 3L)))  // ceil(2.5) = 3
    assert(got((1L, 2L)) == ((5L, 5L)))  // ceil(5) = 5
    assert(got((9L, 10L)) == ((9L, 9L)))
  }

  test("NULLs excluded; rank beyond population fails loudly") {
    val df = Seq[Option[Long]](Some(1L), None, Some(3L)).toDF("v")
    val got = ExactQuantile.globalRanks(df, "v", Seq(2L))
      .head()
    assert(got.getLong(1) == 3L)
    intercept[IllegalArgumentException] {
      ExactQuantile.globalRanks(df, "v", Seq(3L)).collect()
    }
  }

  test("invariant to partitioning and to lowBits") {
    val df = (1L to 3000L).map(i => i * 31 % 1013).toDF("v")
    val ranks = Seq(1L, 1500L, 3000L)
    val a = ExactQuantile.globalRanks(df, "v", ranks, lowBits = 2)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val b = ExactQuantile.globalRanks(df.repartition(17), "v", ranks, lowBits = 9)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("the phase-2 scan reads only located buckets (pruned candidate set)") {
    // structural: the picked grid only contains buckets that ranks map to
    val df = (1L to (1L << 14)).toDF("v")
    val out = ExactQuantile.globalRanks(df, "v", Seq(5L), lowBits = 8)
    assert(out.count() == 1)
    // rank 5 lives in bucket 0 (values 1..255): the answer is exact
    assert(out.head().getLong(1) == 5L)
  }

  test("weightedQuantiles: the median by mass, not by row") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7: total 10, rank ceil(5)=5 -> value 4
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 7L)).toDF("v", "w")
    val out = ExactQuantile.weightedQuantiles(df, "v", "w",
      Seq((1L, 2L))).head()
    assert(out.getLong(3) == 4L, "mass median")
    assert(out.getLong(4) == 10L)
    // unweighted median of the same rows is 2 (rank 2 of 4)
    val un = ExactQuantile.globalRanks(df, "v", Seq(2L)).head().getLong(1)
    assert(un == 2L)
  }

  test("weightedQuantiles matches brute force on random data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(500)((rnd.nextInt(60).toLong, 1L + rnd.nextInt(9)))
    val qs = Seq((1L, 4L), (1L, 2L), (9L, 10L))
    val got = ExactQuantile.weightedQuantiles(
      rows.toDF("v", "w").repartition(13), "v", "w", qs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    val wTot = rows.map(_._2).sum
    val sorted = rows.sortBy(_._1)
    for ((a, b) <- qs) {
      val k = (a * wTot + b - 1) / b
      var cum = 0L
      val want = sorted.find { case (_, w) => cum += w; cum >= k }.get._1
      assert(got((a, b)) == want, s"q=$a/$b")
    }
  }

  test("weightedQuantiles rejects non-positive weights loudly") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, 3L)).toDF("v", "w")
    assert(intercept[IllegalArgumentException] {
      ExactQuantile.weightedQuantiles(df, "v", "w", Seq((1L, 2L)))
    }.getMessage.contains("positive"))
  }

  test("medianCi: hand-computed order-statistic interval on 1..100") {
    import spark.implicits._
    // n=100: half = 1.959964*10/2 = 9.79982; l = ceil(40.20018) = 41,
    // u = floor(60.79982) = 60, median rank 50
    val df = (1 to 100).map(_.toLong).toDF("v")
    val r = ExactQuantile.medianCi(df, "v").head()
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("median") == 50L)
    assert(r.getAs[Long]("ci_lo") == 41L)
    assert(r.getAs[Long]("ci_hi") == 60L)
    assert(r.getAs[Long]("rank_lo") == 41L)
    assert(r.getAs[Long]("rank_hi") == 60L)
  }

  test("medianCi: interval brackets the median, narrows with n; " +
    "refuses tiny inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    def ci(n: Int): (Long, Long, Long) = {
      val df = (1 to n).map(_ => rnd.nextInt(10000).toLong).toDF("v")
      val r = ExactQuantile.medianCi(df, "v").head()
      (r.getAs[Long]("ci_lo"), r.getAs[Long]("median"),
        r.getAs[Long]("ci_hi"))
    }
    val (lo, med, hi) = ci(2000)
    assert(lo <= med && med <= hi)
    val (lo2, _, hi2) = ci(200)
    // relative width shrinks roughly like 1/sqrt(n)
    assert((hi - lo).toDouble < (hi2 - lo2).toDouble)
    intercept[IllegalArgumentException](
      ExactQuantile.medianCi((1 to 5).map(_.toLong).toDF("v"), "v"))
  }

  test("groupedRanks == per-group globalRanks (one pass, same values)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 500).map(_ => ("a", rnd.nextInt(100000).toLong)) ++
      (1 to 300).map(_ => ("b", rnd.nextInt(50).toLong)) ++ // heavy ties
      (1 to 7).map(i => ("c", i.toLong * 1000000))          // tiny + sparse
    val df = rows.toDF("g", "v")
    val ranksOf = Map(
      "a" -> Seq(1L, 250L, 500L, 100L),
      "b" -> Seq(150L, 1L, 300L),
      "c" -> Seq(1L, 7L, 4L))
    val got = ExactQuantile.groupedRanks(df, "g", "v", ranksOf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((g, rs) <- ranksOf) {
      val want = ExactQuantile.globalRanks(
          df.filter(col("g") === g).select(col("v")), "v", rs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (r <- rs.distinct)
        assert(got((g, r)) == want(r), s"group $g rank $r")
    }
    assert(got.size == ranksOf.values.map(_.distinct.size).sum)
  }

  test("two-level cumulation: exact on a 1e12-range domain, and the " +
    "bucket-level window is partitioned (no one-task funnel)") {
    import spark.implicits._
    // values spread over ~[0, 1e12): at lowBits=8 the bucket grid spans
    // ~4e9 ids — the domain class the old global-window cumsum funneled
    // through one task
    val vals = (1L to 4000L).map(i => (i * 250000259L) % 1000000000000L)
    val df = vals.toDF("v").repartition(13)
    val sorted = vals.sorted
    val ranks = Seq(1L, 1000L, 2000L, 3999L, 4000L)
    val got = ExactQuantile.globalRanks(df, "v", ranks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ranks.foreach(r => assert(got(r) == sorted((r - 1).toInt), s"rank $r"))

    // plan hygiene: the __b-ordered cumsum window must carry the __sb
    // partition spec — a global (unpartitioned) window ordering by __b
    // is exactly the funnel the two-level scan removes
    val hist = df.select(col("v").cast("long").as("__v"))
      .groupBy(shiftright(col("__v"), 8).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val cum = ExactQuantile.cumulateBuckets(hist, Nil)
    val plan = cum.queryExecution.executedPlan.toString
    val bucketWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("__b#"))
      .filter(l => l.matches(""".*\], \[__b#\d+L? ASC.*""")) // ordered by __b
      .toSeq
    assert(bucketWindows.nonEmpty, s"no bucket-level window found in:\n$plan")
    bucketWindows.foreach(l =>
      assert(l.matches(""".*\], \[__sb#\d+L?\], \[__b#\d+L? ASC.*"""),
        s"bucket-level window is NOT partitioned by __sb:\n$l"))
    // and the spread is real: this domain populates thousands of
    // distinct super-buckets, so the partitioned window genuinely
    // parallelizes instead of degenerating to one partition
    val supers = hist.select(shiftright(col("__b"), 16).as("__sb"))
      .distinct().count()
    assert(supers > 1000, s"expected a wide super grid, got $supers")

    // bit-identical to the single-window cumsum it replaced
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = hist.withColumn("__hi", sum(col("__c")).over(wb))
      .withColumn("__lo", col("__hi") - col("__c"))
      .orderBy("__b").collect().map(_.toSeq).toSeq
    val twoLevel = cum.orderBy("__b")
      .select(col("__b"), col("__c"), col("__hi"), col("__lo"))
      .collect().map(_.toSeq).toSeq
    assert(twoLevel == ref)
  }

  test("groupedRanks on a wide-domain group matches brute force") {
    import spark.implicits._
    val wide = (1L to 1500L).map(i => ("w", (i * 777000777L) % 999999999999L))
    val tiny = (1L to 40L).map(i => ("t", i % 7))
    val df = (wide ++ tiny).toDF("g", "v").repartition(11)
    val got = ExactQuantile.groupedRanks(df, "g", "v",
        Map("w" -> Seq(1L, 750L, 1500L), "t" -> Seq(1L, 20L, 40L)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ws = wide.map(_._2).sorted; val ts = tiny.map(_._2).sorted
    assert(got(("w", 1L)) == ws(0) && got(("w", 750L)) == ws(749) &&
      got(("w", 1500L)) == ws(1499))
    assert(got(("t", 1L)) == ts(0) && got(("t", 20L)) == ts(19) &&
      got(("t", 40L)) == ts(39))
  }

  test("groupedRanks refusals: absent group, rank beyond population") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(intercept[RuntimeException](
      ExactQuantile.groupedRanks(df, "g", "v", Map("zz" -> Seq(1L)))
    ).getMessage.contains("zz"))
    assert(intercept[IllegalArgumentException](
      ExactQuantile.groupedRanks(df, "g", "v", Map("a" -> Seq(3L)))
    ).getMessage.contains("beyond"))
  }
}
