package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class OverlapSpec extends AnyFunSuite with SparkSuite {

  private def matrix(rows: Seq[(String, String)], n: Int) = {
    import spark.implicits._
    Overlap.sourceOverlap(rows.toDF("src", "text").select(
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("src")), "text", "src", n)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
  }

  test("whole-document mode (n=0): exact cross-source duplicates counted once") {
    val rows = Seq(
      ("a", "shared doc one"), ("a", "only in a"), ("a", "shared doc two"),
      ("b", "shared doc one"), ("b", "shared doc two"), ("b", "b's own"),
      ("c", "nothing in common"))
    val m = matrix(rows, 0)
    assert(m.keySet == Set(("a", "b")))
    val (shared, na, nb, ov) = m(("a", "b"))
    assert(shared == 2L && na == 3L && nb == 3L)
    assert(math.abs(ov - 2.0 / 3.0) < 1e-12)
  }

  test("duplicate rows within one source do not inflate counts (distinct keys)") {
    val rows = Seq(("a", "same text"), ("a", "same text"), ("b", "same text"))
    val m = matrix(rows, 0)
    assert(m(("a", "b")) == ((1L, 1L, 1L, 1.0)))
  }

  test("shingle mode (n): partial copying is caught where whole-doc equality misses it") {
    val core = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      ("a", s"$core uniquea1 uniquea2"),
      ("b", s"uniqueb0 $core uniqueb9"),  // contains the core, not equal
      ("c", "totally different words here entirely now"))
    assert(matrix(rows, 0).isEmpty)            // no exact dup
    val m = matrix(rows, 3)
    assert(m.contains(("a", "b")))             // shared trigrams from the core
    assert(m(("a", "b"))._1 >= 4L)             // the 4 interior core trigrams
    assert(!m.contains(("a", "c")) && !m.contains(("b", "c")))
  }

  test("overlap coefficient uses the smaller side (containment-sensitive)") {
    // b is a subset of a's content
    val rows = Seq(("a", "one two three four five six seven eight"),
      ("b", "one two three four five"))
    val m = matrix(rows, 3)
    val (shared, na, nb, ov) = m(("a", "b"))
    assert(nb < na && shared == nb)  // every b-trigram is in a
    assert(ov == 1.0)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      (s"s${i % 4}", (0 to 8).map(j => s"w${(i * 3 + j) % 23}").mkString(" ")))
    val df1 = rows.toDF("src", "text").coalesce(1)
    val df2 = rows.toDF("src", "text").repartition(13)
    val a = Overlap.sourceOverlap(df1, "text", "src", 3)
      .orderBy("source_a", "source_b").collect().toSeq
    val b = Overlap.sourceOverlap(df2, "text", "src", 3)
      .orderBy("source_a", "source_b").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
