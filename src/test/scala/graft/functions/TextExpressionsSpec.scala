package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** The compiled text kernels must be drop-in equal to the built-in
  * forms they replace — the oracles keep replaying the BUILT-IN form,
  * so any divergence is a silent hash break waiting for a corpus that
  * exercises it. */
class TextExpressionsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("punct_to_dot == regexp_replace('[^a-z0-9 ]+', ' . ') on adversarial text") {
    val rows = Seq(
      "plain words only",
      "gradient descent, stochastic; newton-raphson!",
      "tabs\tand\nnewlines\r\nmixed",
      "digits 123 mix3d w1th text",
      "…unicode — dashes – and “quotes”",
      "中文没有空格也没有标点吗？有的。",
      "mixed 中文 and english, with 标点。 breaks",
      "", " ", "...", "a", ".", "  double  spaces  kept  ",
      "emoji 😀😀 pairs 🎉 end",
      "trailing punct!", "!leading punct", "UPPER already lowered by caller")
      .zipWithIndex.map { case (t, i) => (i.toLong, t.toLowerCase) }
    val df = rows.toDF("id", "t")
    val got = df.select(col("id"),
        TextExpressions.punct_to_dot(col("t")).as("a"),
        regexp_replace(col("t"), "[^a-z0-9 ]+", " . ").as("b"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"row ${r.getLong(0)}: '${r.getString(1)}' != '${r.getString(2)}'"))
  }

  test("punct_to_dot equality on the real documents corpus") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val bad = docs.select(
        TextExpressions.punct_to_dot(lower(col("text"))).as("a"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " . ").as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad == 0L)
  }

  test("alnum_run_count == size(regexp_extract_all('[a-z0-9]+')) everywhere") {
    val adversarial = Seq("", " ", "a", "1", "a1 b2", "...", "a.b.c",
      "中文word混合123字", "  spaced   out  ", "ends with run",
      "!starts! with? punct").zipWithIndex
      .map { case (t, i) => (i.toLong, t.toLowerCase) }.toDF("id", "t")
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id").as("id"), lower(col("text")).as("t"))
    Seq(adversarial, docs).foreach { df =>
      val bad = df.select(
          TextExpressions.alnum_run_count(col("t")).as("a"),
          size(regexp_extract_all(col("t"), lit("[a-z0-9]+"), lit(0))).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0L)
    }
  }

  test("shingle_hashes_pos: positional, non-distinct, offset-mapped") {
    val df = Seq((1L, "a b a b a")).toDF("id", "t")
    val hs = df.select(TextExpressions.shingle_hashes_pos(col("t"), 2).as("h"))
      .head().getSeq[Long](0)
    assert(hs.length == 4)            // offsets 0..3
    assert(hs(0) == hs(2))            // "a b" at offsets 0 and 2
    assert(hs(1) == hs(3))            // "b a" at offsets 1 and 3
    assert(hs(0) != hs(1))
    // and the distinct form agrees on the SET
    val dist = df.select(TextExpressions.shingle_hashes(col("t"), 2).as("h"))
      .head().getSeq[Long](0)
    assert(dist.toSet == hs.toSet && dist.length == 2)
  }
}
