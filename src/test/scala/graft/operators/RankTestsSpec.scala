package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class RankTestsSpec extends AnyFunSuite with SparkSuite {

  private def auc(rows: Seq[(String, Long, Boolean)]) = {
    import spark.implicits._
    RankTests.aucPerGroup(rows.toDF("g", "score", "pos"), "g", "score", col("pos"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .toMap
  }

  test("perfect separation gives AUC 1, reversed gives 0, all-ties 0.5") {
    val m = auc(
      Seq(("hi", 10L, true), ("hi", 11L, true), ("hi", 1L, false), ("hi", 2L, false),
        ("lo", 1L, true), ("lo", 2L, true), ("lo", 10L, false), ("lo", 11L, false),
        ("tie", 5L, true), ("tie", 5L, true), ("tie", 5L, false)))
    assert(m("hi")._4 == 1.0)
    assert(m("lo")._4 == 0.0)
    assert(m("tie")._4 == 0.5)
  }

  test("hand-computed U with a tie straddling the classes") {
    // pos = [2, 3], neg = [2, 1]: pairs (2,2)=½ (2,1)=1 (3,2)=1 (3,1)=1
    // U1 = 3.5, u2 = 7, AUC = 3.5/4 = 0.875
    val m = auc(Seq(("g", 2L, true), ("g", 3L, true), ("g", 2L, false), ("g", 1L, false)))
    assert(m("g") == ((2L, 2L, 7L, 0.875)))
  }

  test("NULL scores are excluded from ranking, not silently ordered") {
    import spark.implicits._
    val df = Seq(("g", Some(3L), true), ("g", None, true), ("g", Some(1L), false))
      .toDF("g", "score", "pos")
    val r = RankTests.aucPerGroup(df, "g", "score", col("pos")).collect().head
    // only the two non-null rows rank: pos [3] vs neg [1] -> AUC 1
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L && r.getDouble(4) == 1.0)
  }

  test("one-class groups report NULL AUC") {
    val m = auc(Seq(("allpos", 1L, true), ("allpos", 2L, true),
      ("allneg", 1L, false)))
    assert(m("allpos")._4.isNaN && m("allneg")._4.isNaN)
    assert(m("allpos")._3 == 0L) // u2 still defined (degenerate 0)
  }

  test("precisionThreshold: deepest feasible prefix, hand-computed") {
    import spark.implicits._
    // scores desc: (10,pos)(9,pos)(8,neg)(7,pos)(6,neg)(5,neg)
    // cum precision: 1/1, 2/2, 2/3, 3/4, 3/5, 3/6 -> deepest >= 1/2 is rank 6
    val df = Seq((1L, 10L, true), (2L, 9L, true), (3L, 8L, false),
      (4L, 7L, true), (5L, 6L, false), (6L, 5L, false))
      .map { case (id, s, p) => ("g", id, s, p) }.toDF("g", "id", "score", "pos")
    val r = RankTests.precisionThreshold(df, "g", "score", col("pos"), "id", 1L, 2L)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ==
      ((6L, 5L, 3L, 0.5)))
    // at 3/4 precision the deepest feasible prefix is rank 4
    val r2 = RankTests.precisionThreshold(df, "g", "score", col("pos"), "id", 3L, 4L)
      .collect().head
    assert((r2.getLong(1), r2.getLong(2)) == ((4L, 7L)))
  }

  test("precisionThreshold: infeasible group reports NULLs") {
    import spark.implicits._
    val df = Seq(("g", 1L, 5L, false), ("g", 2L, 4L, false))
      .toDF("g", "id", "score", "pos")
    val r = RankTests.precisionThreshold(df, "g", "score", col("pos"), "id", 1L, 2L)
      .collect().head
    assert(r.isNullAt(1) && r.isNullAt(4))
  }

  test("matches brute-force pairwise AUC on random data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (s"g${i % 3}", rnd.nextInt(20).toLong, rnd.nextBoolean())
    }
    val got = RankTests.aucPerGroup(
      rows.toDF("g", "score", "pos").repartition(13), "g", "score", col("pos"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val pos = rows.filter(r => r._1 == g && r._3).map(_._2)
      val neg = rows.filter(r => r._1 == g && !r._3).map(_._2)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val expect = wins / (pos.size.toDouble * neg.size.toDouble)
      assert(math.abs(got(g) - expect) < 1e-12, s"$g: ${got(g)} vs $expect")
    }
  }

  test("mannWhitney matches a brute-force tie-corrected U and z") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 120).map { i =>
      val g = i % 2
      (g, (rnd.nextInt(20) + (if (g == 1) 4 else 0)).toLong)
    }
    val out = RankTests.mannWhitney(rows.toDF("g", "v"), "g", "v").head()
    val g1 = rows.filter(_._1 == 1).map(_._2)
    val g0 = rows.filter(_._1 == 0).map(_._2)
    val u1 = (for (x <- g1; y <- g0) yield
      if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
    assert(out.getAs[Double]("u1") == u1)
    assert(out.getAs[Double]("u2") == g1.size.toDouble * g0.size - u1)
    val n1 = g1.size.toDouble; val n2 = g0.size.toDouble; val nn = n1 + n2
    val ties = rows.groupBy(_._2).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val varU = n1 * n2 / 12.0 * ((nn + 1.0) - ties / (nn * (nn - 1.0)))
    val z = (u1 - n1 * n2 / 2.0) / math.sqrt(varU)
    assert(math.abs(out.getAs[Double]("z") - z) < 1e-6)
  }

  test("mannWhitney is partitioning-invariant and refuses degenerates") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i % 2, (i % 9).toLong))
    val df = rows.toDF("g", "v")
    assert(RankTests.mannWhitney(df.coalesce(1), "g", "v").head().toSeq ==
      RankTests.mannWhitney(df.repartition(11), "g", "v").head().toSeq)
    intercept[IllegalArgumentException] {
      RankTests.mannWhitney(Seq((0, 5L), (1, 5L)).toDF("g", "v"), "g", "v")
    }
    intercept[IllegalArgumentException] {
      RankTests.mannWhitney(Seq((0, 1L), (2, 2L)).toDF("g", "v"), "g", "v")
    }
  }

  test("kruskalWallis matches a brute-force midrank H") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 150).map { i =>
      val g = s"g${i % 3}"
      (g, (rnd.nextInt(15) + (i % 3) * 2).toLong)
    }
    val out = RankTests.kruskalWallis(rows.toDF("g", "v"), "g", "v")
      .collect()
    // brute force: midranks over the pooled sorted sample
    val sorted = rows.map(_._2).sorted
    val rank = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(xs => xs.map(_._2 + 1).sum.toDouble / xs.size).toMap
    val byG = rows.groupBy(_._1)
    val nn = rows.size.toDouble
    val s = byG.values.map { xs =>
      val r = xs.map(x => rank(x._2)).sum
      r * r / xs.size
    }.sum
    val h = 12.0 / (nn * (nn + 1.0)) * s - 3.0 * (nn + 1.0)
    val ties = rows.groupBy(_._2).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val hc = h / (1.0 - ties / (nn * nn * nn - nn))
    out.foreach { r =>
      val g = r.getString(0)
      val expR = byG(g).map(x => rank(x._2)).sum
      assert(math.abs(r.getAs[Double]("rank_sum") - expR) < 1e-9, g)
      assert(math.abs(r.getAs[Double]("h") - h) < 1e-6)
      assert(math.abs(r.getAs[Double]("h_corrected") - hc) < 1e-6)
      assert(r.getAs[Long]("df") == 2L)
    }
  }

  test("cliffsDelta: hand-computed pair counts and magnitude") {
    import spark.implicits._
    // g1 = {3,5}, g0 = {1,4}: gt = 3 (3>1, 5>1, 5>4), lt = 1 (3<4),
    // eq = 0 → delta = (3-1)/4 = 0.5 → 'large'
    val df = Seq((1, 3L), (1, 5L), (0, 1L), (0, 4L)).toDF("g", "v")
    val r = RankTests.cliffsDelta(df, "g", "v").head()
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("gt_pairs") == 3.0)
    assert(r.getAs[Double]("lt_pairs") == 1.0)
    assert(r.getAs[Double]("tie_pairs") == 0.0)
    assert(r.getAs[Double]("delta") == 0.5)
    assert(r.getAs[String]("magnitude") == "large")
  }

  test("cliffsDelta: ties count neither way; identical groups give 0") {
    import spark.implicits._
    val df = Seq((1, 2L), (1, 7L), (0, 2L), (0, 7L)).toDF("g", "v")
    val r = RankTests.cliffsDelta(df, "g", "v").head()
    assert(r.getAs[Double]("tie_pairs") == 2.0)
    assert(r.getAs[Double]("delta") == 0.0)
    assert(r.getAs[String]("magnitude") == "negligible")
  }

  test("cliffsDelta: brute force agreement and partition invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(120)((rnd.nextInt(2), rnd.nextInt(9).toLong))
    val g1 = rows.filter(_._1 == 1).map(_._2)
    val g0 = rows.filter(_._1 == 0).map(_._2)
    val gt = (for (a <- g1; b <- g0) yield if (a > b) 1L else 0L).sum
    val lt = (for (a <- g1; b <- g0) yield if (a < b) 1L else 0L).sum
    val df = rows.toDF("g", "v")
    val r = RankTests.cliffsDelta(df.repartition(7), "g", "v").head()
    assert(r.getAs[Double]("gt_pairs") == gt.toDouble)
    assert(r.getAs[Double]("lt_pairs") == lt.toDouble)
    val a = RankTests.cliffsDelta(df.coalesce(1), "g", "v").head().toSeq
    assert(a == r.toSeq)
  }
}
