package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class FingerprintSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def sum1(rows: Seq[(Long, String)], cols: Seq[String]): (Long, Long) = {
    val r = Fingerprint.tableChecksum(rows.toDF("id", "text"), cols).head()
    (r.getLong(0), r.getLong(1))
  }

  test("checksum is invariant to row order and partitioning") {
    val rows = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val a = sum1(rows, Seq("id", "text"))
    val b = sum1(rows.reverse, Seq("id", "text"))
    assert(a == b)
    val df = rows.toDF("id", "text")
    val p1 = Fingerprint.tableChecksum(df.repartition(1), Seq("id", "text")).head().getLong(1)
    val p7 = Fingerprint.tableChecksum(df.repartition(7), Seq("id", "text")).head().getLong(1)
    assert(p1 == p7)
  }

  test("a single changed value changes the checksum; equal data matches") {
    val base = Seq((1L, "alpha"), (2L, "beta"))
    val changed = Seq((1L, "alpha"), (2L, "betb"))
    assert(sum1(base, Seq("id", "text")) != sum1(changed, Seq("id", "text")))
    assert(sum1(base, Seq("id", "text")) == sum1(base.map(identity), Seq("id", "text")))
  }

  test("NULL is distinct from empty string; column subset narrows the witness") {
    val withNull = Seq((1L, null: String))
    val withEmpty = Seq((1L, ""))
    assert(sum1(withNull, Seq("id", "text")) != sum1(withEmpty, Seq("id", "text")))
    // differing text is invisible when only id is fingerprinted
    assert(sum1(Seq((1L, "x")), Seq("id")) == sum1(Seq((1L, "y")), Seq("id")))
  }

  test("per-group checksums partition the table fingerprint") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("src", "v")
    val got = Fingerprint.groupChecksum(df, "src", Seq("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a")._1 == 2L && got("b")._1 == 1L)
    // group checksums recompose: same rows grouped differently disagree,
    // but the union of group sums equals the table sum mod 2^62
    val table = Fingerprint.tableChecksum(df, Seq("v")).head().getLong(1)
    val recombined = (BigInt(got("a")._2) + BigInt(got("b")._2)) %
      BigInt(4611686018427387904L)
    assert(BigInt(table) == recombined)
  }

  test("duplicate rows are counted: multiset, not set, semantics") {
    val once = sum1(Seq((1L, "dup")), Seq("id", "text"))
    val twice = sum1(Seq((1L, "dup"), (1L, "dup")), Seq("id", "text"))
    assert(once != twice && twice._1 == 2L)
  }
}
