package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AllPairsSpec extends AnyFunSuite with SparkSuite {

  private def pairs(docs: Seq[(Long, String)], threshold: Double,
                    maxDf: Option[Long] = None) = {
    import spark.implicits._
    AllPairs.cosinePairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        threshold, maxDf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("identical documents have cosine exactly 1.0") {
    // 6 filler docs keep df(shared terms) informative (bits(8) > bits(2))
    val got = pairs(Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")) ++
      (3L to 8L).map(i => (i, s"unrelated$i words$i entirely$i")), 0.99)
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L))._2 == 1.0)
  }

  test("cosine matches a hand-computed integer tf·idf dot product") {
    // N=4 docs, df(a)=df(b)=2: bits(4)=3, bits(2)=2 → unit weight
    // d1 vec {a:2, b:1}, d2 vec {a:1, b:2}; dot=2·1+1·2=4; norms 5,5
    // cos = 4/√(5·5) = 4/5 exactly (one sqrt of the exact product)
    val got = pairs(Seq((1L, "a a b"), (2L, "a b b"), (3L, "c"), (4L, "d")), 0.5)
    assert(got((1L, 2L)) == ((4L, 0.8))) // 4/sqrt(25) exact
  }

  test("all-stopword documents (every term in ≥ half the corpus) yield no pairs, not 0/0") {
    // with N=3 every term of d1/d2 has bits(3)==bits(2) → weight 0 → the
    // docs vanish from the weighted space instead of dividing by zero
    val got = pairs(Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "c")), 0.0)
    assert(got.isEmpty)
  }

  test("weighted angle catches same-topic pairs that trigram Jaccard misses") {
    // shared RARE vocabulary, different word order/fillers — no shared
    // trigram shingles, but high cosine
    val d1 = "quantum entanglement decoherence qubit teleportation x1 y1 z1"
    val d2 = "qubit decoherence teleportation entanglement quantum x2 y2 z2"
    val filler = (1 to 20).map(i => s"f$i").mkString(" ")
    val corpus = Seq((1L, d1), (2L, d2)) ++ (3L to 12L).map(i => (i, filler + s" u$i"))
    val cos = pairs(corpus, 0.3)
    // dot = 5 shared rare terms (w=2 each) = 20; norms = 5·4 + 3·9 = 47
    assert(cos.contains((1L, 2L)))
    assert(math.abs(cos((1L, 2L))._2 - 20.0 / 47.0) < 1e-9)
    import spark.implicits._
    val jac = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"),
      "doc_id", "text", n = 3, threshold = 0.2, hashShingles = true)
      .filter("a_id = 1 AND b_id = 2")
    assert(jac.isEmpty) // zero shared trigrams
  }

  test("maxDf removes hot terms from norms AND dots (reduced-space cosine)") {
    // N=12: "hot" in 7 docs (bits 4−3 → w=1); docs 1,2 share rare terms
    val corpus = Seq((1L, "hot rare1 rare2"), (2L, "hot rare1 rare2")) ++
      (3L to 7L).map(i => (i, s"hot only$i")) ++
      (8L to 12L).map(i => (i, s"solo$i alone$i"))
    val uncapped = pairs(corpus, 0.0)
    val capped = pairs(corpus, 0.0, maxDf = Some(6L)) // drops "hot" (df=7)
    // hot-only pairs (i,j ≤ 7) vanish entirely under the cap
    assert(capped.keySet == Set((1L, 2L)))
    assert(uncapped.keySet.size > 1)
    // (1,2) survives both ways but with different scores (reduced space)
    assert(uncapped.contains((1L, 2L)))
    assert(capped((1L, 2L))._2 == 1.0) // only the identical rare terms remain
    assert(capped((1L, 2L))._1 < uncapped((1L, 2L))._1) // smaller dot
  }

  test("prefix-filtered path equals the plain join path exactly") {
    import spark.implicits._
    // random corpus with shared-vocab structure (some dense similarity)
    val docs = (1L to 80L).map(i =>
      (i, (0 to 11).map(j => s"t${(i * 5 + j * 3) % 29}").mkString(" ")))
      .toDF("doc_id", "text")
    for (thr <- Seq(0.3, 0.5, 0.8, 0.95)) {
      val plain = AllPairs.cosinePairs(docs, "doc_id", "text", thr)
        .orderBy("a_id", "b_id").collect().toSeq
      val pref = AllPairs.cosinePairs(docs, "doc_id", "text", thr,
        prefixFilter = true).orderBy("a_id", "b_id").collect().toSeq
      assert(pref == plain, s"divergence at threshold $thr")
      assert(plain.nonEmpty || thr > 0.9)
    }
  }

  test("prefix path equality holds with maxDf and on near-identical dense docs") {
    import spark.implicits._
    // base words in ~1/3 of docs (informative weight, dense similarity
    // among sharers); the rest are disjoint fillers keeping df < N/2
    val base = "alpha beta gamma delta epsilon"
    val docs = ((1L to 8L).map(i => (i, s"$base extra$i")) ++
      (9L to 30L).map(i => (i, s"own$i solo$i lone$i")) ++
      Seq((99L, base), (100L, base))).toDF("doc_id", "text")
    for (cap <- Seq(None, Some(15L))) {
      val plain = AllPairs.cosinePairs(docs, "doc_id", "text", 0.6, cap)
        .orderBy("a_id", "b_id").collect().toSeq
      val pref = AllPairs.cosinePairs(docs, "doc_id", "text", 0.6, cap,
        prefixFilter = true).orderBy("a_id", "b_id").collect().toSeq
      assert(pref == plain && plain.nonEmpty)
    }
  }

  test("incremental vs corpus agrees with the full self-join restricted to cross pairs") {
    import spark.implicits._
    // 5 of 23 vocab terms per doc keeps df ≈ 13 ≪ N/2 = 30 (informative)
    val docs = (1L to 60L).map(i =>
      (i, (0 to 4).map(j => s"t${(i + j * 5) % 23}").mkString(" "))).toDF("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = AllPairs.cosineAgainstCorpus(batch, corpus, "doc_id", "text", 0.3)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    // reference: full all-pairs over the union, keep cross pairs (either direction)
    val full = AllPairs.cosinePairs(docs, "doc_id", "text", 0.3)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (x, y) => x % 5 == 0 && y % 5 != 0 }.toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("incremental: a re-ingested identical doc scores 1.0 against its original only once") {
    import spark.implicits._
    val corpus = ((1L to 10L).map(i => (i, s"own$i solo$i lone$i")) :+
      (11L, "alpha beta gamma")).toDF("doc_id", "text")
    val batch = Seq((99L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = AllPairs.cosineAgainstCorpus(batch, corpus, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((99L, 11L, 1.0)))
  }

  test("partitioning-invariant (integer dots, IEEE sqrt)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (0 to 9).map(j => s"t${(i + j * 3) % 17}").mkString(" ")))
    val a = AllPairs.cosinePairs(docs.toDF("doc_id", "text").coalesce(1),
      "doc_id", "text", 0.3).orderBy("a_id", "b_id").collect().toSeq
    val b = AllPairs.cosinePairs(docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text", 0.3).orderBy("a_id", "b_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
