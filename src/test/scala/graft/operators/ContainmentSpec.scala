package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ContainmentSpec extends AnyFunSuite with SparkSuite {

  private def pairs(docs: Seq[(Long, String)], num: Long = 4, den: Long = 5,
                    hash: Boolean = true, maxDf: Option[Long] = None) = {
    import spark.implicits._
    Dedup.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, thresholdNum = num, thresholdDen = den,
        hashShingles = hash, maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
  }

  // an excerpt fully inside a much larger doc: the case Jaccard misses
  private val big = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val excerpt = (10 to 15).map(i => s"tok$i").mkString(" ")

  test("full quote: containment 1.0 in the excerpt direction only") {
    val got = pairs(Seq((1L, big), (2L, excerpt)))
    // excerpt: 4 shingles, all in big (38 shingles) → contained 2→1 at 1.0
    assert(got.exists { case (c, ct, i, sz, v) =>
      c == 2L && ct == 1L && i == 4L && sz == 4L && v == 1.0 })
    // the reverse direction (big inside excerpt) is 4/38 ≈ 0.105 — cut
    assert(!got.exists { case (c, ct, _, _, _) => c == 1L && ct == 2L })
    // and Jaccard at the same 0.8 threshold finds NOTHING here
    import spark.implicits._
    val jac = Dedup.ngramJaccardPairs(
      Seq((1L, big), (2L, excerpt)).toDF("doc_id", "text"),
      "doc_id", "text", n = 3, threshold = 0.8, hashShingles = true)
    assert(jac.isEmpty)
  }

  test("threshold boundary is exact (integer cross-multiply): c/size == num/den passes") {
    // excerpt of 5 shingles, 4 shared → 4/5 exactly at threshold 4/5
    val ex = (10 to 16).map(i => s"tok$i").mkString(" ") // 5 shingles
    val exMut = ex.replace("tok16", "zzz")               // last shingle breaks
    val got = pairs(Seq((1L, big), (2L, exMut)))
    val hit = got.find { case (c, ct, _, _, _) => c == 2L && ct == 1L }
    assert(hit.isDefined)
    assert(hit.get._3 == 4L && hit.get._4 == 5L) // exactly 4/5 — the boundary
    // every emitted row satisfies the exact rational test
    got.foreach { case (_, _, i, sz, _) => assert(i * 5 >= 4 * sz) }
  }

  test("hashed and exact shingles agree") {
    val docs = Seq((1L, big), (2L, excerpt), (3L, "totally different words here now"))
    assert(pairs(docs, hash = true).sortBy(p => (p._1, p._2)).toSeq ==
      pairs(docs, hash = false).sortBy(p => (p._1, p._2)).toSeq)
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 60L).map(i =>
      (i, (0 to 12).map(j => s"w${(i * 7 + j) % 19}").mkString(" ")))
    val one = Dedup.containmentPairs(docs.toDF("doc_id", "text").coalesce(1),
      "doc_id", "text", 3, 1, 2).orderBy("contained_id", "container_id").collect().toSeq
    val many = Dedup.containmentPairs(docs.toDF("doc_id", "text").repartition(11),
      "doc_id", "text", 3, 1, 2).orderBy("contained_id", "container_id").collect().toSeq
    assert(one == many && one.nonEmpty)
  }

  test("maxDf drops hot shingles from the join but sizes stay exact (under-estimate only)") {
    // one shingle shared by every doc; capping it removes those pairs
    val docs = (1L to 10L).map(i => (i, s"common stop words unique$i tail$i end$i"))
    val uncapped = pairs(docs, num = 1, den = 4)
    val capped = pairs(docs, num = 1, den = 4, maxDf = Some(3L))
    assert(capped.length <= uncapped.length)
    // capped containment never exceeds uncapped for the same pair
    val um = uncapped.map(p => (p._1, p._2) -> p._3).toMap
    capped.foreach { case (c, ct, i, _, _) => assert(i <= um((c, ct))) }
  }
}
