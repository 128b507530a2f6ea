package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DependenciesSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val rows = Seq(
    // k=1 determines "a" cleanly (3 rows)
    (Some(1L), Some("a")), (Some(1L), Some("a")), (Some(1L), Some("a")),
    // k=2 splits 2-"b" / 1-"c": majority 2, g3 contribution 1
    (Some(2L), Some("b")), (Some(2L), Some("c")), (Some(2L), Some("b")),
    // k=3: (3, NULL) vs (3, "d") violate — NULL dep is its own class
    (Some(3L), None), (Some(3L), Some("d")),
    // NULL determinant rows are excluded entirely
    (None, Some("e")))
    .toDF("k", "v")

  test("fdAudit: hand-computed g3 with NULL-dep class and NULL-det drop") {
    val r = Dependencies.fdAudit(rows, Seq("k" -> "v")).head()
    assert(r.getAs[String]("fd") == "k->v")
    assert(r.getAs[Long]("n_rows") == 8L)        // NULL det excluded
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_violating_keys") == 2L)
    assert(r.getAs[Long]("n_violations") == 2L)  // (2: 3-2) + (3: 2-1)
    assert(r.getAs[Double]("g3_error") == 0.25)
    assert(!r.getAs[Boolean]("holds"))
  }

  test("fdAudit: a real key FD holds; several FDs share one scan shape") {
    val df = Seq((1L, "x", 10L), (2L, "y", 10L), (3L, "x", 20L))
      .toDF("id", "a", "b")
    val out = Dependencies.fdAudit(df, Seq("id" -> "a", "a" -> "b"))
      .collect().map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("holds"))).toMap
    assert(out("id->a") == ((0L, true)))
    assert(out("a->b") == ((1L, false))) // a=x maps to 10 and 20
  }

  test("fdAudit refuses trivial and empty candidate lists") {
    intercept[IllegalArgumentException](
      Dependencies.fdAudit(rows, Seq.empty))
    intercept[IllegalArgumentException](
      Dependencies.fdAudit(rows, Seq("k" -> "k")))
  }

  test("fdAudit is partitioning-invariant") {
    val big = (1 to 400)
      .map(i => (i.toLong % 37, s"v${i % 5}", s"w${i % 11}"))
      .toDF("k", "v", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dependencies.fdAudit(d, Seq("k" -> "v", "v" -> "w"))
        .collect().map(_.toString).toSeq
    assert(run(big.coalesce(1)) == run(big.repartition(13)))
  }

  test("inclusionAudit: orphans counted by key and by row; NULLs excluded") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Dependencies.inclusionAudit(child, "ck", parent, "pk", "t").head()
    assert(r.getAs[String]("fk") == "t")
    assert(r.getAs[Long]("n_child_rows") == 6L)   // NULL child dropped
    assert(r.getAs[Long]("n_child_keys") == 3L)
    assert(r.getAs[Long]("n_orphan_keys") == 1L)  // key 9
    assert(r.getAs[Long]("n_orphan_rows") == 3L)
    assert(r.getAs[Double]("coverage") == 0.5)
  }

  test("reconcile: every key lands in exactly one hand-computed band") {
    val child = Seq(
      (1L, 500L), (1L, 500L),   // rolls to 1000 = parent: exact
      (2L, 9999L),              // parent 10000: 1 off = 0.01% -> 0.1pct
      (3L, 9900L),              // parent 10000: 1% band
      (4L, 9000L),              // parent 10000: 10% band
      (5L, 5L),                 // parent 10000: beyond
      (6L, 77L))                // no parent: child_only
      .toDF("k", "cents")
    val parent = Seq((1L, 1000L), (2L, 10000L), (3L, 10000L),
      (4L, 10000L), (5L, 10000L), (7L, 42L))   // 7 has no child
      .toDF("k", "cents")
    val out = Dependencies.reconcile(child, "k", "cents",
      parent, "k", "cents")
      .collect().map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("abs_diff_cents"))).toMap
    assert(out("1_child_only") == ((1L, 0L)))
    assert(out("2_parent_only") == ((1L, 0L)))
    assert(out("3_exact") == ((1L, 0L)))
    assert(out("4_within_0_1pct") == ((1L, 1L)))
    assert(out("5_within_1pct") == ((1L, 100L)))
    assert(out("6_within_10pct") == ((1L, 1000L)))
    assert(out("7_beyond_10pct") == ((1L, 9995L)))
    assert(out.size == 7)
  }

  test("reconcile: boundary cross-multiplication is exact; duplicate " +
    "parent refused; partitioning-invariant") {
    // d*1000 == |p| sits exactly ON the 0.1% boundary -> inclusive
    val child = Seq((1L, 999L)).toDF("k", "cents")
    val parent = Seq((1L, 1000L)).toDF("k", "cents")
    val r = Dependencies.reconcile(child, "k", "cents",
      parent, "k", "cents")
      .filter(org.apache.spark.sql.functions.col("n_keys") > 0).head()
    assert(r.getAs[String]("band") == "4_within_0_1pct")
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("k", "cents")
    val e = intercept[IllegalArgumentException](
      Dependencies.reconcile(child, "k", "cents", dup, "k", "cents"))
    assert(e.getMessage.contains("stated more than once"))
    val bigC = (1 to 400).map(i => (i.toLong % 50, i.toLong)).toDF("k", "c")
    val bigP = (0 until 50).map(i => (i.toLong, i * 31L)).toDF("k", "c")
    def run(a: org.apache.spark.sql.DataFrame) =
      Dependencies.reconcile(a, "k", "c", bigP, "k", "c")
        .collect().map(_.toString).toSeq
    assert(run(bigC.coalesce(1)) == run(bigC.repartition(13)))
  }

  test("inclusionAudit: full coverage and the empty-child degenerate") {
    val child = Seq(1L, 2L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Dependencies.inclusionAudit(child, "ck", parent, "pk", "t").head()
    assert(r.getAs[Long]("n_orphan_rows") == 0L &&
      r.getAs[Double]("coverage") == 1.0)
    val e = Dependencies.inclusionAudit(
      child.filter($"ck" < 0), "ck", parent, "pk", "t").head()
    assert(e.getAs[Long]("n_child_rows") == 0L && e.isNullAt(5))
  }
}
