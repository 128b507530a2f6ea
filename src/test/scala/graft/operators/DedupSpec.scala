package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t
import graft.functions.TextFunctions._

class DedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** documents + planted near-dups: 9001 is a 1-word edit of doc 1,
    * 9002 an exact copy of doc 2, 9003 unrelated. */
  private lazy val planted = {
    val docs = t(spark, sf, "documents").select("doc_id", "text")
    val base = docs.filter($"doc_id".isin(1, 2)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val extra = Seq(
      (9001L, base(1).replaceFirst("\\w+", "zzz")),
      (9002L, base(2)),
      (9003L, "completely unrelated tiny text")).toDF("doc_id", "text")
    docs.union(extra).cache()
  }

  test("exact dedup finds the exact copy") {
    val groups = Dedup.exact(planted, "doc_id", Seq("text"))
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keeper_id") == 2L)
    assert(groups.head.getAs[Long]("n_copies") == 2L)
  }

  test("ngram Jaccard finds planted near-dup and exact pair") {
    val pairs = Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 9001L)))
    assert(pairs.contains((2L, 9002L)))
  }

  test("df-capped Jaccard: subset of exact pairs, planted dups survive") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, 0.5))
    val capped = ids(Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, 0.5,
      maxDf = Some(20L)))
    assert(capped.subsetOf(exact)) // under-estimates, never invents pairs
    assert(capped.contains((1L, 9001L))) // near-dups share rare shingles
    assert(capped.contains((2L, 9002L)))
  }

  test("prefix-filtered Jaccard join == unfiltered join (exact, both thresholds)") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"a_id", $"b_id", round($"jaccard", 9)).orderBy($"a_id", $"b_id")
        .collect().toSeq
    for (t <- Seq(0.5, 0.8)) {
      val plain = norm(Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, t,
        hashShingles = true))
      val pref = norm(Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, t,
        hashShingles = true, prefixFilter = true))
      assert(pref == plain, s"threshold $t")
      assert(plain.nonEmpty)
    }
  }

  test("MinHash LSH output == exact jaccard join output at threshold") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"a_id", $"b_id", round($"jaccard", 9)).orderBy($"a_id", $"b_id")
        .collect().toSeq
    val lsh = norm(Dedup.minhashLshPairs(planted, "doc_id", "text", 3, 24, 8, 0.8))
    val exact = norm(Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, 0.8))
    assert(lsh == exact)
  }

  test("SimHash pairs: exact copy at hamming 0; all pairs high-jaccard") {
    val sh = Dedup.simhashPairs(planted, "doc_id", "text", 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(sh.exists { case (a, b, h) => a == 2L && b == 9002L && h == 0L })
    // every simhash pair should also be a >=0.5-jaccard pair (no junk)
    val jac = Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sh.foreach { case (a, b, _) => assert(jac.contains((a, b)), s"($a,$b)") }
  }

  test("incremental LSH vs corpus == full-corpus pairs crossing the split") {
    val corpus = planted.filter($"doc_id" < 9000)
    val batch = planted.filter($"doc_id" >= 9000)
    val corpusSig = Dedup.minhashSignatureTable(corpus, "doc_id", "text", 3, 24)
    val inc = Dedup.minhashLshPairsAgainst(batch, "doc_id", "text", corpusSig,
        3, 24, 8, 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9)))
      .toSet
    // full-corpus pairs restricted to those crossing the batch/corpus
    // boundary; a_id < b_id and batch ids are larger, so a is corpus-side
    val full = Dedup.minhashLshPairs(planted, "doc_id", "text", 3, 24, 8, 0.8)
      .filter($"b_id" >= 9000 && $"a_id" < 9000)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), math.rint(r.getDouble(2) * 1e9)))
      .toSet
    assert(inc == full)
    assert(inc.exists { case (b, c, _) => b == 9001L && c == 1L }) // planted edit
    assert(inc.exists { case (b, c, _) => b == 9002L && c == 2L }) // planted copy
    spark.catalog.clearCache()
  }

  test("novelAgainst keeps only batch rows whose key is unseen in corpus") {
    val corpus = planted.filter($"doc_id" < 9000)
    val batch = planted.filter($"doc_id" >= 9000)
    val novel = Dedup.novelAgainst(batch, corpus, Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 9002 is an exact copy of doc 2; 9001 (one-word edit) and 9003 are novel
    assert(novel == Set(9001L, 9003L))
  }

  test("semantic dedup drops a planted embedding duplicate, keeps min id") {
    val e = t(spark, sf, "embeddings").select($"vec_id", $"embedding")
    val dupVec = e.filter($"vec_id" === 7).head().getSeq[Float](1)
    val withDup = e.union(Seq((99991L, dupVec)).toDF("vec_id", "embedding"))
    val kept = Dedup.semantic(withDup, "vec_id", "embedding",
        numClusters = 8, tau = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // identical vectors always share a cluster, so the dup is caught even
    // though cluster blocking is approximate for merely-similar pairs
    assert(kept.contains(7L) && !kept.contains(99991L))
    // near-uniform sphere vectors never reach tau=0.999: nothing else drops
    assert(kept.size == withDup.count() - 1)
  }

  test("semantic dedup auto-scales its cluster count with the corpus") {
    // the rule itself: ~targetClusterSize-row blocks, floored at k0
    assert(Dedup.autoClusters(0) == 8)
    assert(Dedup.autoClusters(5000) == 8)          // small corpus: floor wins
    assert(Dedup.autoClusters(8192) == 8)
    assert(Dedup.autoClusters(8193) == 9)          // ceil division
    assert(Dedup.autoClusters(1000000) == 977)     // ~n/1024: linear growth
    assert(Dedup.autoClusters(10000000) == 9766)   // 10x corpus -> 10x clusters
    assert(Dedup.autoClusters(100, k0 = 2, targetClusterSize = 10) == 10)
    // and the auto default still catches planted exact duplicates
    val e = t(spark, sf, "embeddings").select($"vec_id", $"embedding")
    val dupVec = e.filter($"vec_id" === 7).head().getSeq[Float](1)
    val withDup = e.union(Seq((99991L, dupVec)).toDF("vec_id", "embedding"))
    val kept = Dedup.semantic(withDup, "vec_id", "embedding", tau = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(7L) && !kept.contains(99991L))
    assert(kept.size == withDup.count() - 1)
  }

  test("langId picks en for English-stopword text, und for none") {
    val df = Seq(
      (1, "the cat and the dog of a house"),
      (2, "xyzzy plugh qwerty")).toDF("id", "text")
      .select($"id", langId($"text").as("l")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(df(1) == "en")
    assert(df(2) == "und")
  }
}
