package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class VocabStatsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("zipfFit recovers slope -1 on an exactly Zipfian corpus") {
    // term tNN appears floor(1200 / rank) times: f = C/r ⇒ ln f =
    // ln C − ln r, so the OLS slope is ≈ −1 with r2 ≈ 1 (floor()
    // quantization is the only deviation)
    val words = (1 to 40).flatMap(r => Seq.fill(1200 / r)(f"t$r%02d"))
    val df = Seq(words.mkString(" ")).toDF("text")
    val row = VocabStats.zipfFit(df, "text", topN = 40).head()
    assert(row.getAs[Long]("n_terms") == 40)
    assert(math.abs(row.getAs[Double]("slope") + 1.0) < 0.02,
      s"slope=${row.getAs[Double]("slope")}")
    assert(row.getAs[Double]("r2") > 0.999)
  }

  test("zipfFit: a flat (un-Zipfian) corpus slopes near 0") {
    val words = (1 to 30).flatMap(r => Seq.fill(50)(f"u$r%02d"))
    val row = VocabStats.zipfFit(Seq(words.mkString(" ")).toDF("text"),
      "text", topN = 30).head()
    assert(math.abs(row.getAs[Double]("slope")) < 1e-9)
  }

  test("jsDivergence: identical corpora diverge 0; disjoint vocab ln 2") {
    val a = Seq("alpha beta beta gamma", "delta alpha").toDF("text")
    val same = VocabStats.jsDivergence(a, a, "text").head()
    assert(same.getAs[Double]("jsd") == 0.0)
    val b = Seq("zeta eta eta theta", "iota zeta").toDF("text")
    val disj = VocabStats.jsDivergence(a, b, "text").head()
    assert(math.abs(disj.getAs[Double]("jsd") - math.log(2.0)) < 1e-5,
      s"jsd=${disj.getAs[Double]("jsd")}")
  }

  test("jsDivergence attribution: the term that moved leads") {
    // identical mixes except 'shift' dominates cur
    val a = Seq("x y z").toDF("text")
    val b = Seq("x y z shift shift shift shift shift").toDF("text")
    val top = VocabStats.jsDivergence(a, b, "text", topContrib = 1).head()
    assert(top.getAs[String]("term") == "shift")
    assert(top.getAs[Long]("n_ref") == 0 && top.getAs[Long]("n_cur") == 5)
  }

  test("entropy: uniform mix is perfectly even; single group degenerates") {
    val u = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("src", "mass")
    val r = Inequality.entropy(u, "src", "mass").collect()
    assert(r.length == 4)
    assert(r.forall(_.getAs[Double]("evenness") == 1.0))
    assert(r.forall(_.getAs[Double]("effective_n") == 4.0))
    assert(r.forall(_.getAs[Double]("share") == 0.25))
    val one = Inequality.entropy(Seq(("a", 7L)).toDF("src", "mass"),
      "src", "mass").head()
    assert(one.getAs[Double]("entropy") == 0.0)
    assert(one.isNullAt(one.fieldIndex("evenness")))
    assert(one.getAs[Double]("effective_n") == 1.0)
  }

  test("entropy's effective_n dominates HHI's (Hill-number ordering)") {
    val skew = Seq(("a", 70L), ("b", 20L), ("c", 9L), ("d", 1L))
      .toDF("src", "mass")
    val e = Inequality.entropy(skew, "src", "mass").head()
      .getAs[Double]("effective_n")
    val h = Inequality.hhi(skew, "src", "mass").head()
      .getAs[Double]("effective_n")
    assert(e >= h, s"exp(H)=$e < 1/HHI=$h")
  }

  test("lexicalDiversity hand-computed TTR family") {
    import spark.implicits._
    val df = Seq(("s", "a b a"), ("s", "b c")).toDF("source", "text")
    val r = VocabStats.lexicalDiversity(df, "source", "text").head()
    // tokens 5, types 3
    assert(r.getLong(1) == 3 && r.getLong(2) == 5)
    assert(r.getDouble(3) == 0.6)
    assert(math.abs(r.getDouble(4) - 3.0 / math.sqrt(5.0)) < 1e-6)
    assert(math.abs(r.getDouble(5) - math.log(3.0) / math.log(5.0)) < 1e-6)
  }

  test("lexicalDiversity: single-token groups are excluded (ln 1 = 0 denominator)") {
    import spark.implicits._
    val df = Seq(("one", "solo"), ("two", "a b")).toDF("source", "text")
    val out = VocabStats.lexicalDiversity(df, "source", "text").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("two"))
  }

  test("richness hand-computed: Chao1 and unseen mass") {
    import spark.implicits._
    val df = Seq(("g", "a b c c")).toDF("lang", "text")
    val r = VocabStats.richness(df, "lang", "text").head()
    // tf: a1 b1 c2 -> types 3, tokens 4, n1 2, n2 1
    assert(r.getLong(1) == 3 && r.getLong(2) == 4 &&
      r.getLong(3) == 2 && r.getLong(4) == 1)
    assert(r.getDouble(5) == 3.5)   // 3 + 2*1/(2*2)
    assert(r.getDouble(6) == 0.5)   // 2/4
  }

  test("richness: saturated vocabulary has zero unseen mass") {
    import spark.implicits._
    val df = Seq(("g", "x x y y z z")).toDF("lang", "text")
    val r = VocabStats.richness(df, "lang", "text").head()
    assert(r.getLong(3) == 0 && r.getDouble(6) == 0.0)
    assert(r.getDouble(5) == 3.0)   // chao1 collapses to observed types
  }
  test("concentration: hand-computed Yule K and Simpson D") {
    import spark.implicits._
    // "a a a b": N=4, V={a:3, b:1}; sum f^2 = 10; sum f(f-1) = 6
    // K = 1e4 (10-4)/16 = 3750; D = 6/(4*3) = 0.5
    val df = Seq(("g", "a a a b")).toDF("src", "text")
    val r = VocabStats.concentration(df, "src", "text").head()
    assert(r.getAs[Long]("types") == 2L && r.getAs[Long]("tokens") == 4L)
    assert(r.getAs[Double]("yule_k") == 3750.0)
    assert(r.getAs[Double]("simpson_d") == 0.5)
  }

  test("concentration separates template-heavy from uniform sources at equal TTR") {
    import spark.implicits._
    // both sources: 4 types / 8 tokens (TTR 0.5); repeats concentrate
    // on one word in A, spread evenly in B
    val df = Seq(
      ("A", "w w w w w x y z"),
      ("B", "w w x x y y z z")).toDF("src", "text")
    val out = VocabStats.concentration(df, "src", "text").collect()
      .map(r => r.getAs[String]("src") ->
        (r.getAs[Double]("yule_k"), r.getAs[Double]("simpson_d"))).toMap
    assert(out("A")._1 > out("B")._1)
    assert(out("A")._2 > out("B")._2)
    // equal-TTR check: identical type/token counts
    val tt = VocabStats.lexicalDiversity(df, "src", "text").collect()
      .map(r => r.getAs[Double]("ttr")).distinct
    assert(tt.length == 1)
  }

  test("concentration: single-token groups are excluded (D undefined)") {
    import spark.implicits._
    val df = Seq(("g", "solo"), ("h", "two words")).toDF("src", "text")
    val out = VocabStats.concentration(df, "src", "text").collect()
    assert(out.map(_.getAs[String]("src")).toSeq == Seq("h"))
  }

  test("concentration is partition-invariant") {
    import spark.implicits._
    val df = Seq(("A", "w w w w w x y z"), ("B", "w w x x y y z z"),
      ("A", "more words w w")).toDF("src", "text")
    val a = VocabStats.concentration(df, "src", "text")
      .collect().map(_.toString).toSeq
    val b = VocabStats.concentration(df.repartition(5), "src", "text")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
