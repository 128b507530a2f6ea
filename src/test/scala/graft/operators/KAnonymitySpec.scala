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
}
