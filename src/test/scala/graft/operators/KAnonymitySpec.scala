package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class KAnonymitySpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val rows = Seq(
    ("us", "a", 1), ("us", "a", 2), ("us", "a", 3),   // cell of 3
    ("us", "b", 4),                                   // cell of 1
    ("de", "a", 5), ("de", "a", 6))                   // cell of 2
    .toDF("country", "seg", "id")

  test("violations lists exactly the sub-k cells with their counts") {
    val v = KAnonymity.violations(rows, Seq("country", "seg"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(v == Map(("us", "b") -> 1L, ("de", "a") -> 2L))
  }

  test("summary: hand-computed release numbers") {
    val s = KAnonymity.summary(rows, Seq("country", "seg"), k = 3L).head()
    assert(s.getLong(0) == 6L)  // n_rows
    assert(s.getLong(1) == 3L)  // n_cells
    assert(s.getLong(2) == 2L)  // violating cells
    assert(s.getLong(3) == 3L)  // rows at risk (1 + 2)
    assert(s.getLong(4) == 1L)  // min cell
    assert(s.getLong(5) == 1L)  // realized k
  }

  test("a k-anonymous table has no violations and realized k >= k") {
    val ok = Seq(("x", 1), ("x", 2), ("y", 3), ("y", 4)).toDF("g", "id")
    assert(KAnonymity.violations(ok, Seq("g"), 2L).count() == 0)
    assert(KAnonymity.summary(ok, Seq("g"), 2L).head().getLong(5) == 2L)
  }

  test("NULL quasi-identifier values form their own cell (they identify too)") {
    val df = Seq(Some("x"), Some("x"), None).toDF("g")
    val v = KAnonymity.violations(df, Seq("g"), 2L).collect()
    assert(v.length == 1 && v(0).isNullAt(0) && v(0).getLong(1) == 1L)
  }

  test("invariant to partitioning") {
    val big = (1 to 500).map(i => (s"c${i % 7}", s"s${i % 3}", i)).toDF("c", "s", "id")
    val a = KAnonymity.summary(big, Seq("c", "s"), 5L).head().toSeq
    val b = KAnonymity.summary(big.repartition(13), Seq("c", "s"), 5L).head().toSeq
    assert(a == b)
  }

  test("lDiversity flags homogeneous cells with the entropy readout") {
    import spark.implicits._
    // cell A: 4 rows all sensitive "x" (l=1); cell B: 4 rows, 2+2 split
    // (l=2, entropy-l = 2); cell C: diverse (l=3, not flagged at l=3)
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "x"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "y"), ("C", "z")).toDF("qi", "s")
    val out = KAnonymity.lDiversity(df, Seq("qi"), "s", l = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("l_distinct"),
          r.getAs[Double]("entropy_l"))).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A") == ((4L, 1L, 1.0)))
    assert(out("B")._2 == 2L && math.abs(out("B")._3 - 2.0) < 1e-9)
  }

  test("lDiversity is partitioning-invariant; NULL sensitive is a class") {
    import spark.implicits._
    val df = Seq(("A", "x"), ("A", null), ("A", "x"), ("B", "x"))
      .toDF("qi", "s")
    def run(d: org.apache.spark.sql.DataFrame) =
      KAnonymity.lDiversity(d, Seq("qi"), "s", l = 3)
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(7)))
    val a = KAnonymity.lDiversity(df, Seq("qi"), "s", l = 3)
      .filter(org.apache.spark.sql.functions.col("qi") === "A").head()
    assert(a.getAs[Long]("l_distinct") == 2L) // x and NULL
  }

  test("tCloseness: hand-computed ordered EMDs (incl. the flat-CDF fill)") {
    import spark.implicits._
    // global over v: {1:3, 2:2, 3:2}, N=7, m=3; cumQ = 3/7, 5/7, 1
    //  A = {1,1}:  |1-3/7|+|1-5/7|+0 = 6/7   → /(m-1) = 3/7
    //  B = {2,3}:  3/7 + 3/14 + 0   = 9/14  → 9/28
    //  C = {1,2,3}: 2/21 + 1/21 + 0 = 1/7   → 1/14
    // A has NO rows at v=2,3 — its CDF must fill flat at 1 (the
    // running-max fill), which is exactly where a naive join-only
    // cumulative would zero out.
    val df = Seq(
      ("A", 1L), ("A", 1L),
      ("B", 2L), ("B", 3L),
      ("C", 1L), ("C", 2L), ("C", 3L)).toDF("qi", "v")
    val out = KAnonymity.tCloseness(df, Seq("qi"), "v", t = 0.4)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("emd"),
          r.getAs[Boolean]("violates"))).toMap
    assert(out("A") == ((2L, BigDecimal(3.0 / 7).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, true)))
    assert(out("B") == ((2L, BigDecimal(9.0 / 28).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, false)))
    assert(out("C") == ((3L, BigDecimal(1.0 / 14).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, false)))
  }

  test("tCloseness: identical cell == global distribution has EMD 0; " +
    "partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 60).map(i => (s"q${i % 3}", (i % 4).toLong))
      .toDF("qi", "v")
    // each of the 3 cells sees each v in {0,1,2,3} exactly 5 times —
    // every cell IS the global distribution
    val out = KAnonymity.tCloseness(df, Seq("qi"), "v", t = 0.1)
    assert(out.collect().forall(r => r.getAs[Double]("emd") == 0.0))
    val a = KAnonymity.tCloseness(df.coalesce(1), Seq("qi"), "v", 0.1)
      .collect().map(_.toString).toSeq
    val b = KAnonymity.tCloseness(df.repartition(11), Seq("qi"), "v", 0.1)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("tCloseness refuses a degenerate one-value sensitive domain") {
    import spark.implicits._
    val df = Seq(("A", 1L), ("B", 1L)).toDF("qi", "v")
    val e = intercept[IllegalArgumentException](
      KAnonymity.tCloseness(df, Seq("qi"), "v", 0.2))
    assert(e.getMessage.contains("distinct sensitive values"))
  }
}
