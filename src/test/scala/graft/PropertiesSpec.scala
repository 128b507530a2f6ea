package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Tokenizer
import graft.operators.Splits
import graft.rag.TokenBudget
import graft.search.VectorSearch

/** The SURVEY §5.2 property-based layer: invariants that must hold for
  * ALL inputs, not just fixtures (ScalaCheck, fixed seed count).
  * Driver-side properties run pure; dataset properties (top-k nesting,
  * split assignment) run once on a generated corpus — one Spark job per
  * case would be wasteful and adds nothing to the property.
  */
class PropertiesSpec extends AnyFunSuite with SparkSuite {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-5f, 5f)).map(_.toArray)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine: self-similarity ~1, symmetry, range [-1,1]") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val nonZero = a.exists(_ != 0f) && b.exists(_ != 0f)
      !nonZero || (
        math.abs(cos(a, a) - 1.0) < 1e-9 &&
        cos(a, b) == cos(b, a) &&
        cos(a, b) >= -1.0 - 1e-12 && cos(a, b) <= 1.0 + 1e-12)
    })
  }

  test("top-k nesting: exact top-k is a prefix of top-(k+1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 200L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1).toSeq))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) embedding")
      .cache()
    val probe = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val tops = (1 to 8).map { k =>
      VectorSearch.exactTopK(corpus, "embedding", "vec_id", probe, k)
        .select("vec_id").as[Long].collect().toSeq
    }
    tops.sliding(2).foreach { case Seq(a, b) => assert(b.startsWith(a)); case _ => }
    corpus.unpersist()
  }

  test("tokenizer: decode(encode(x)) == x and concat merges at most one boundary pair") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      Tokenizer.decode(Tokenizer.encode(a)) == a &&
        Tokenizer.count(a + b) <= Tokenizer.count(a) + Tokenizer.count(b) + 1
    })
  }

  test("T5 trim: user prompt survives; payloads shrink; under-trim quirk bounded") {
    val words = Gen.chooseNum(1, 400)
    check(Prop.forAll(words, words, Gen.chooseNum(250, 1200)) { (nRag, nConv, budget) =>
      val rag = Seq.fill(nRag)("data").mkString(" ")
      val conv = Seq.fill(nConv)("talk").mkString(" ")
      val prompt = "what about the bikes?"
      val (aug, convAndPrompt) = TokenBudget.buildPrompts(prompt, conv, rag, budget)
      val promptKept = convAndPrompt.endsWith("\n" + prompt)
      val shrunk = Tokenizer.count(aug) <= Tokenizer.count(rag) &&
        Tokenizer.count(convAndPrompt) <= Tokenizer.count(conv + "\n" + prompt)
      val total = Tokenizer.count(rag) + Tokenizer.count(conv) +
        Tokenizer.count(prompt) + 200
      val budgetOk = if (total <= budget) true else {
        // the reference shrinks rag and conv by THEIR shares of the
        // excess only — the prompt+buffer share of the reduction is
        // by-design never reclaimed (ChatService.cs:206-210). Bound the
        // post-trim total by exactly that envelope (+ rounding slack).
        val r = total - budget
        val undertrim = math.ceil(
          r.toDouble * (Tokenizer.count(prompt) + 200).toDouble / total).toInt
        val newTotal = Tokenizer.count(aug) + Tokenizer.count(convAndPrompt) + 200
        newTotal <= budget + undertrim + 4
      }
      promptKept && shrunk && budgetOk
    })
  }

  test("W1 history: chronological suffix within budget (quirk included)") {
    val msgGen = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(1, 50)))
    check(Prop.forAll(msgGen, Gen.chooseNum(10, 200)) { (tokenCounts, budget) =>
      val msgs = tokenCounts.zipWithIndex.map { case (tk, i) =>
        (new java.sql.Timestamp(1000L * i), tk, s"m$i")
      }
      val out = TokenBudget.conversationHistory(msgs, budget)
      val kept = out.split("\n").filter(_.nonEmpty).toSeq
      val suffix = kept == msgs.map(_._3).takeRight(kept.size)
      val withinBudget = msgs.takeRight(kept.size).map(_._2).sum <= budget
      suffix && withinBudget
    })
  }

  test("splits: exhaustive, disjoint, stable; stratified sample is a subset") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = new scala.util.Random(11).shuffle((0L until 5000L).toList).take(1200)
    val df = ids.toDF("id").withColumn("stratum", (col("id") % 3).cast("string"))
    val out = Splits.withSplit(df, "id")
    assert(out.filter(col("split").isNull).count() == 0)
    assert(out.count() == ids.size)
    val sampled = Splits.stratifiedSample(df, "id", "stratum",
      Map("0" -> 0.5, "1" -> 0.2), defaultFraction = 0.9)
      .select("id").as[Long].collect().toSet
    assert(sampled.subsetOf(ids.toSet))
    // monotonicity: raising every fraction can only add rows
    val bigger = Splits.stratifiedSample(df, "id", "stratum",
      Map("0" -> 0.8, "1" -> 0.5), defaultFraction = 1.0)
      .select("id").as[Long].collect().toSet
    assert(sampled.subsetOf(bigger))
  }
}
