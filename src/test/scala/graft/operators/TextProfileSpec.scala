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
}
