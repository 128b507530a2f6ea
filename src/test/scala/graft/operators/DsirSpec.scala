package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[Dsir]] — importance-resampling selection contract: the hashed
  * uni+bigram features, add-one-smoothed LM log-ratio, target
  * exclusion, and the rounded-score top-k cut, all against a
  * brute-force driver replica (the q425 gate re-proves the DuckDB
  * replay at corpus scale). */
class DsirSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val B = 4096

  private def charFold(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 1000000007L)

  private def gramsOf(text: String): Seq[String] = {
    val w = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** Driver replica of importanceScores. */
  private def expect(docs: Seq[(Long, String, Boolean)]): Map[Long, Double] = {
    val feats = docs.map { case (id, t, tgt) =>
      (id, tgt, gramsOf(t).groupBy(g => charFold(g) % B).view.mapValues(_.size.toLong).toMap)
    }
    val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    feats.foreach { case (_, tgt, m) =>
      m.foreach { case (b, n) => if (tgt) ct(b) += n else cr(b) += n } }
    val nt = ct.values.sum; val nr = cr.values.sum
    def ld(b: Long): Double =
      math.log((ct(b) + 1).toDouble / (nt + B)) -
        math.log((cr(b) + 1).toDouble / (nr + B))
    feats.collect { case (id, false, m) =>
      val s = m.map { case (b, n) => n * ld(b) }.sum
      id -> math.rint(s * 1e6) / 1e6
    }.toMap
  }

  test("scores match the driver replica; target docs are excluded") {
    val docs = Seq(
      (1L, "spark table scan join", true),
      (2L, "hash join shuffle spark", true),
      (3L, "spark table scan join extra", false),   // target-like: high
      (4L, "zebra yak xylophone quux", false),      // alien: low
      (5L, "hash join spark table", false))
    val out = Dsir.importanceScores(
        docs.toDF("doc_id", "text", "t"), "doc_id", "text", col("t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    val want = expect(docs)
    assert(out.keySet == Set(3L, 4L, 5L)) // no target docs scored
    want.foreach { case (id, s) => assert(out(id) == s, s"doc $id") }
    assert(out(3L) > out(4L)) // target-like outranks alien text
  }

  test("selectTopK: rounded-score desc, id-tiebreak, exact k") {
    // docs 10/11 are IDENTICAL → identical scores, tie broken by id.
    // (Note the self-penalty: duplicated raw docs inflate their own
    // raw-LM counts, so the shorter unseen doc 12 outranks them — the
    // replica agrees; DSIR's ratio punishes raw-frequent text.)
    val docs = Seq(
      (1L, "alpha beta gamma", true),
      (10L, "alpha beta gamma delta", false),
      (11L, "alpha beta gamma delta", false),
      (12L, "omega psi chi", false))
    val out = Dsir.selectTopK(docs.toDF("doc_id", "text", "t"),
        "doc_id", "text", col("t"), k = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val want = expect(docs).toSeq
      .sortBy { case (id, s) => (-s, id) }.map(_._1).take(3)
    assert(out == want)
    assert(out.indexOf(10L) + 1 == out.indexOf(11L)) // tie → lower id first
  }

  test("feature stream: uni+bigram counts land in [0, B) buckets") {
    val docs = Seq((1L, "a b c", false), (2L, "", false), (3L, "solo", true))
    val out = Dsir.importanceScores(docs.toDF("doc_id", "text", "t"),
      "doc_id", "text", col("t")).collect()
    // empty doc contributes no features → absent from the score output
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    // 3 unigrams + 2 bigrams, all alive in the replica too
    assert(gramsOf("a b c") == Seq("a", "b", "c", "a b", "b c"))
    assert(gramsOf("a b c").forall(g => (charFold(g) % B) >= 0 && (charFold(g) % B) < B))
  }

  test("compiled kernel == interpreted HOF bucket stream (parity)") {
    import graft.functions.TextExpressions.dsir_gram_buckets
    val adversarial = Seq(
      "", " ", "  a  b ", "solo", "a b c d e",
      "MiXeD Case WORDS here", "unicode éü中文 words",
      "surrogate 😀 pair 🎉 grams",
      "punct, marks. #here! (and) [more]",
      "numbers 123 456 mixed a1b2")
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = df.select(col("id"),
        dsir_gram_buckets(lower(col("text")), 4096).as("k"),
        Dsir.hofGramBuckets(col("text"), 4096).as("h"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // and over the real corpus: every doc's streams identical
    val real = graft.Tables.t(spark, sf, "documents")
      .select(dsir_gram_buckets(lower(col("text")), 4096).as("k"),
        Dsir.hofGramBuckets(col("text"), 4096).as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(real == 0L)
  }

  test("real corpus slice: selection is deterministic across layouts") {
    val d = graft.Tables.t(spark, sf, "documents")
    val a = Dsir.selectTopK(d, "doc_id", "text",
      col("source").isin("src0", "src1"), k = 20)
      .collect().map(_.toString).toSeq
    val b = Dsir.selectTopK(d.repartition(13), "doc_id", "text",
      col("source").isin("src0", "src1"), k = 20)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
