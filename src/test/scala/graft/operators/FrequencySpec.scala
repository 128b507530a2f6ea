package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t
import graft.functions.TextFunctions.words

class FrequencySpec extends AnyFunSuite with SparkSuite {

  private lazy val tokens = t(spark, sf, "documents")
    .select(explode(words(col("text"))).as("w"))
    .filter(col("w") =!= "")
    .cache()

  private def exactTop(k: Int): Seq[(String, Long)] =
    tokens.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("heavy hitters equal the full groupBy top-k") {
    val got = Frequency.heavyHitters(tokens, "w", k = 20, support = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(20))
  }

  test("partition-layout invariant (sketch merge order does not leak)") {
    val got = Frequency.heavyHitters(tokens.repartition(17), "w", 10, 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(10))
  }

  test("a broken support promise falls back to the exact path, never lies") {
    // support 0.2: nothing clears 20% share, the candidate set cannot
    // cover the true top-10 — the operator must detect it and still
    // return the exact answer via the fallback
    val got = Frequency.heavyHitters(tokens, "w", 10, support = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(10))
  }

  test("a frequent NULL is verified and ranked like any other value") {
    import spark.implicits._
    // null is the single most frequent "value": it must appear in the
    // top-k with its exact count (isin alone would silently drop it)
    val vals = (Seq.fill(40)(null.asInstanceOf[String]) ++
      Seq.fill(25)("a") ++ Seq.fill(15)("b") ++ (1 to 20).map(i => s"rare$i"))
    val df = vals.toDF("w").repartition(7)
    val got = Frequency.heavyHitters(df, "w", k = 3, support = 0.05)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(got == Seq((None, 40L), (Some("a"), 25L), (Some("b"), 15L)))
  }

  test("adversarial merge error cannot fake soundness (cap sized for 2 phases)") {
    import spark.implicits._
    // many partitions × many near-threshold values: with a 1/support
    // cap the merged sketch could evict a value in (support, 2·support]
    // yet still pass the soundness check; the 2/support cap keeps every
    // above-support value a candidate, so the fast path stays exact
    val vals = (1 to 30).flatMap(i => Seq.fill(30 + i)(s"v$i")) ++
      (1 to 400).map(i => s"noise$i")
    val df = vals.toDF("w").repartition(13)
    val exact = df.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Frequency.heavyHitters(df, "w", k = 8, support = 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("counts are exact, not estimates") {
    val hh = Frequency.heavyHitters(tokens, "w", 5, 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hh.foreach { case (w, c) =>
      assert(tokens.filter(col("w") === w).count() == c, s"word $w")
    }
  }

  test("count-min: estimate >= true always; exact for isolated keys") {
    import spark.implicits._
    val vals = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"v${i % 50}"))
    val df = vals.toDF("v")
    val sketch = Frequency.countMinBuild(df, "v", depth = 4, width = 1024)
    val probes = (0 until 50).map(i => s"v$i").toDF("v")
    val est = Frequency.countMinEstimate(sketch, probes, "v", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < true $n")
    }
    // 50 keys in 1024 cells x 4 rows: collisions in all 4 rows are
    // overwhelmingly unlikely -> estimates exact here
    assert(truth.forall { case (k, n) => est(k) == n })
  }

  test("count-min: absent key estimates 0 (or a collision, never negative)") {
    import spark.implicits._
    val sketch = Frequency.countMinBuild(Seq("a", "b", "a").toDF("v"), "v")
    val est = Frequency.countMinEstimate(sketch, Seq("zzz").toDF("v"), "v")
      .head().getLong(1)
    assert(est >= 0L)
  }

  test("count-min: sketches merge by cell-wise addition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq.fill(5)("x") ++ Seq.fill(3)("y")
    val b = Seq.fill(2)("x") ++ Seq.fill(7)("z")
    val sa = Frequency.countMinBuild(a.toDF("v"), "v")
    val sb = Frequency.countMinBuild(b.toDF("v"), "v")
    val merged = sa.unionByName(sb).groupBy(col("row"), col("cell"))
      .agg(sum(col("n")).as("n"))
    val whole = Frequency.countMinBuild((a ++ b).toDF("v"), "v")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }
}
