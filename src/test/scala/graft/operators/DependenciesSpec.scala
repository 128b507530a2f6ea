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
