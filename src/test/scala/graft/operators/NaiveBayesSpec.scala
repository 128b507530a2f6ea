package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for bits-NB: perfect separation on a separable
  * corpus, the exact bits arithmetic vs hand computation, prior-only
  * classification of empty docs, tie determinism, and partitioning
  * invariance. */
class NaiveBayesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val train = ((0 until 20).map(i =>
      (i.toLong, "apfel birne apfel kern", "A")) ++
    (0 until 20).map(i =>
      (20L + i, "manzana pera uva semilla", "B"))).toDF("id", "text", "c")

  test("separable corpus classifies perfectly; bits match hand computation") {
    val model = NaiveBayes.train(train, "id", "text", "c")
    val test = Seq((100L, "apfel kern"), (101L, "uva pera manzana"))
      .toDF("id", "text")
    val out = NaiveBayes.predict(test, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getAs[String]("predicted") == "A")
    assert(out(101L).getAs[String]("predicted") == "B")
    // hand bits for doc 100 under class A: prior bitlen(40)-bitlen(20)
    // + per token bitlen(tok_A + V) - bitlen(cnt+1); tok_A = 80, V = 8,
    // cnt(apfel|A) = 40, cnt(kern|A) = 20
    val want = (java.lang.Long.toBinaryString(40).length -
        java.lang.Long.toBinaryString(20).length) +
      (java.lang.Long.toBinaryString(88).length -
        java.lang.Long.toBinaryString(41).length) +
      (java.lang.Long.toBinaryString(88).length -
        java.lang.Long.toBinaryString(21).length)
    assert(out(100L).getAs[Long]("bits") == want.toLong)
  }

  test("tokenless docs classify on priors alone, ties to smallest class") {
    val model = NaiveBayes.train(train, "id", "text", "c")
    val out = NaiveBayes.predict(Seq((7L, "???")).toDF("id", "text"),
      "id", "text", model).head()
    // balanced priors -> equal bits -> tie to 'A'
    assert(out.getAs[String]("predicted") == "A")
    assert(out.getAs[Long]("bits") ==
      (java.lang.Long.toBinaryString(40).length -
        java.lang.Long.toBinaryString(20).length).toLong)
  }

  test("unseen words cost the full smoothed context, never crash") {
    val model = NaiveBayes.train(train, "id", "text", "c")
    val out = NaiveBayes.predict(
      Seq((1L, "zzz apfel qqq")).toDF("id", "text"), "id", "text", model)
      .head()
    assert(out.getAs[String]("predicted") == "A") // apfel still decides
  }

  test("prediction is partitioning-invariant on the real corpus") {
    val docs = graft.Tables.t(spark, sf, "documents")
    import org.apache.spark.sql.functions._
    val tr = docs.filter(col("doc_id") % 2 === 0)
    val te = docs.filter(col("doc_id") % 2 === 1)
    val m = NaiveBayes.train(tr, "doc_id", "text", "lang")
    val a = NaiveBayes.predict(te.repartition(3), "doc_id", "text", m)
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    val m2 = NaiveBayes.train(tr.repartition(7, col("lang")), "doc_id",
      "text", "lang")
    val b = NaiveBayes.predict(te.repartition(11, col("doc_id")), "doc_id",
      "text", m2).orderBy(col("doc_id")).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
