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

  private def sketch(rows: Seq[(String, String)], n: Int, k: Int) = {
    import spark.implicits._
    Overlap.sketchOverlap(rows.toDF("src", "text"), "text", "src", n, k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
  }

  test("sketch: identical sources estimate 1.0; disjoint estimate 0.0") {
    val rows = Seq(
      ("a", "alpha beta gamma delta epsilon"),
      ("b", "alpha beta gamma delta epsilon"),
      ("c", "one two three four five six"))
    val m = sketch(rows, n = 2, k = 8)
    assert(m(("a", "b"))._3 == 1.0)
    assert(m(("a", "c"))._3 == 0.0)
    assert(m(("b", "c"))._3 == 0.0)
  }

  test("sketch with k >= union size is the exact Jaccard of the shingle sets") {
    // a: bigrams {xy, yz, zw}; b: {yz, zw, wv} → J = 2/4 = 0.5
    val rows = Seq(("a", "x y z w"), ("b", "y z w v"))
    val m = sketch(rows, n = 2, k = 64)
    val (ku, both, est) = m(("a", "b"))
    assert(ku == 4L && both == 2L && est == 0.5)
  }

  test("sketch signatures are k-bounded and the estimate is capped at k") {
    // 40 distinct shingles per source, half shared; k = 8 caps the state
    val words = (1 to 41).map(i => s"w$i").mkString(" ")
    val wordsB = ((21 to 61).map(i => s"w$i")).mkString(" ")
    val m = sketch(Seq(("a", words), ("b", wordsB)), n = 1, k = 8)
    val (ku, both, est) = m(("a", "b"))
    assert(ku == 8L, "union cut must be exactly k when enough hashes exist")
    assert(both <= 8L && est >= 0.0 && est <= 1.0)
    // true J = 21/61 ≈ 0.344 — an 8-hash estimate is coarse but must be sane
    assert(est > 0.0 && est < 1.0)
  }

  test("sketch estimate is partitioning-invariant") {
    import spark.implicits._
    val rows = Seq(("a", "p q r s t u v"), ("b", "r s t u v w x"),
      ("c", "p q r z z2 z3 z4"))
    val one = Overlap.sketchOverlap(rows.toDF("src", "text").repartition(1),
      "text", "src", 2, 4).collect().map(_.toSeq).toSet
    val many = Overlap.sketchOverlap(rows.toDF("src", "text").repartition(7),
      "text", "src", 2, 4).collect().map(_.toSeq).toSet
    assert(one == many)
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
