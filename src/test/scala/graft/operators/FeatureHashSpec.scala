package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class FeatureHashSpec extends AnyFunSuite with SparkSuite {

  private def fh(docs: Seq[(Long, String)], dims: Int = 16) = {
    import spark.implicits._
    FeatureHash.featureHash(docs.toDF("doc_id", "text"), "doc_id", "text", dims)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  // driver-side replica of the engine's hash stack for verification
  private def polyKey(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
  private def bucket(key: Long, dims: Int): Int =
    ((((key % 2147483648L) * 2654435761L) % 4294967296L) % dims).toInt
  private def sign(key: Long): Long = key % 2 * 2 - 1

  test("triples replay the documented hash stack exactly") {
    val docs = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta delta"))
    val got = fh(docs)
    val want = docs.flatMap { case (id, text) =>
      text.split(" ").groupBy(identity).map { case (t, occ) =>
        val k = polyKey(t)
        (id, bucket(k, 16), occ.length.toLong * sign(k))
      }
    }.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).filter(_._2 != 0).toMap
    assert(got == want)
  }

  test("dimension bound respected; values are signed sums") {
    val docs = (1L to 50L).map(i => (i, (0 to 30).map(j => s"w${(i + j) % 40}").mkString(" ")))
    val got = fh(docs, dims = 8)
    assert(got.keys.forall { case (_, d) => d >= 0 && d < 8 })
    assert(got.values.exists(_ < 0) && got.values.exists(_ > 0)) // both signs occur
  }

  test("linear in the document: doubling the text doubles every value") {
    val one = fh(Seq((1L, "a b c a")))
    val twice = fh(Seq((1L, "a b c a a b c a")))
    assert(twice == one.map { case (k, v) => k -> v * 2 })
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 120L).map(i => (i, s"t${i % 7} t${i % 11} t${i % 13}"))
    val a = FeatureHash.featureHash(docs.toDF("doc_id", "text").coalesce(1),
      "doc_id", "text", 16).orderBy("doc_id", "dim").collect().toSeq
    val b = FeatureHash.featureHash(docs.toDF("doc_id", "text").repartition(9),
      "doc_id", "text", 16).orderBy("doc_id", "dim").collect().toSeq
    assert(a == b)
  }
}
