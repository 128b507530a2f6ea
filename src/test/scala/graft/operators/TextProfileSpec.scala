package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class TextProfileSpec extends AnyFunSuite with SparkSuite {

  private def curve(df: org.apache.spark.sql.DataFrame) =
    TextProfile.vocabGrowth(df, "doc_id", "text", seed = 7L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("curve is monotone and the last level covers the whole corpus") {
    val docs = t(spark, sf, "documents")
    val c = curve(docs)
    assert(c.sliding(2).forall { case Array(a, b) =>
      a._1 < b._1 && a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4
    })
    val (_, nd, nt, v) = c.last
    assert(nd == docs.count())
    val toks = docs.select(explode(filter(split(col("text"), " "), w => w =!= "")).as("t"))
    assert(nt == toks.count())
    assert(v == toks.distinct().count())
  }

  test("vocab never exceeds tokens at any prefix, and prefixes nest") {
    val c = curve(t(spark, sf, "documents"))
    assert(c.forall { case (_, nd, nt, v) => v <= nt && nd >= 1 })
  }

  test("result is invariant to input partitioning") {
    val docs = t(spark, sf, "documents")
    assert(curve(docs).toSeq == curve(docs.repartition(17, col("source"))).toSeq)
  }

  test("a different seed reassigns prefixes but preserves the endpoint") {
    val docs = t(spark, sf, "documents")
    val a = TextProfile.vocabGrowth(docs, "doc_id", "text", seed = 7L)
      .orderBy(col("level").desc).head()
    val b = TextProfile.vocabGrowth(docs, "doc_id", "text", seed = 99L)
      .orderBy(col("level").desc).head()
    // endpoints (full corpus) agree; the interior curves are different draws
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) ==
      ((b.getLong(1), b.getLong(2), b.getLong(3))))
  }

  test("scriptMix hand-computed ratios over explicit ranges") {
    import spark.implicits._
    // "Ab1 \u044f": latin 2, digit 1, space 1, cyrillic 1, chars 5
    val r = TextProfile.scriptMix(
      Seq(("g", "Ab1 \u044f")).toDF("src", "text"), "src", "text").head()
    assert(r.getLong(2) == 5)
    assert(r.getDouble(3) == 0.4 && r.getDouble(4) == 0.2 &&
      r.getDouble(5) == 0.2 && r.getDouble(6) == 0.2 &&
      r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0)
  }

  test("scriptMix CJK and other buckets; ratios sum to one") {
    import spark.implicits._
    // "\u4e2d\u6587!" : cjk 2, other 1 (the '!')
    val r = TextProfile.scriptMix(
      Seq(("g", "\u4e2d\u6587!")).toDF("src", "text"), "src", "text").head()
    assert(r.getLong(2) == 3)
    assert(math.abs(r.getDouble(7) - 2.0 / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(8) - 1.0 / 3.0) < 1e-6)
    val total = (3 to 8).map(r.getDouble).sum
    assert(math.abs(total - 1.0) < 1e-5)
  }
}
