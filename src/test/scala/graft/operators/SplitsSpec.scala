package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class SplitsSpec extends AnyFunSuite with SparkSuite {

  test("split is stable under repartitioning (randomSplit is not)") {
    val docs = t(spark, sf, "documents")
    def assignment(df: org.apache.spark.sql.DataFrame) =
      Splits.withSplit(df, "doc_id").select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignment(docs)
    val b = assignment(docs.repartition(17, col("source")))
    assert(a == b)
  }

  test("fractions land within grid tolerance and every row is assigned") {
    val out = Splits.withSplit(t(spark, sf, "documents"), "doc_id")
    assert(out.filter(col("split").isNull).count() == 0)
    val n = out.count().toDouble
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byName("train") / n - 0.8) < 0.1)
    assert(byName.keySet == Set("train", "val", "test"))
  }

  test("splits are disjoint and exhaustive by construction") {
    val out = Splits.withSplit(t(spark, sf, "documents"), "doc_id")
    assert(out.select("doc_id").distinct().count() == out.count())
  }

  test("group split: every group lands wholly in one split, stable under repartitioning") {
    val docs = t(spark, sf, "documents")
    val out = Splits.withGroupSplit(docs, "source")
    // leakage safety: one split per source
    val perSource = out.groupBy("source")
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perSource.nonEmpty)
    perSource.foreach(r => assert(r.getLong(1) == 1L, s"source ${r.getString(0)} straddles splits"))
    assert(out.filter(col("split").isNull).count() == 0)
    def assignment(df: org.apache.spark.sql.DataFrame) =
      Splits.withGroupSplit(df, "source").select("source", "split")
        .distinct().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(assignment(docs) == assignment(docs.repartition(17, col("doc_id"))))
  }

  test("stringKey matches a driver-side polynomial hash replay") {
    import spark.implicits._
    val words = Seq("web", "code", "wiki", "", "a b c").toDF("s")
    val got = words.select(col("s"), Splits.stringKey(col("s")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def poly(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)
    got.foreach { case (s, k) => assert(k == poly(s), s"'$s'") }
  }

  test("stratified sample is stable under repartitioning") {
    val docs = t(spark, sf, "documents")
    val fr = Map("en" -> 0.25, "zh" -> 0.4)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Splits.stratifiedSample(df, "doc_id", "lang", fr, defaultFraction = 0.6)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) == ids(docs.repartition(13, col("lang"))))
  }

  test("stratified sample respects per-stratum fractions") {
    val docs = t(spark, sf, "documents")
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Splits.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.25), defaultFraction = 0.6)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small strata at sf0.001 -> generous tolerance; the point is the
    // en fraction is far below the default strata's
    assert(kept("en").toDouble / total("en") < 0.45)
    assert(kept("de").toDouble / total("de") > 0.35)
  }

  test("deterministic shuffle: permutation, partition-invariant, seed-sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0L until 500L)
    val df = ids.toDF("id")
    def order(parts: Int, seed: Long): Seq[Long] =
      Splits.deterministicShuffle(df.repartition(parts), "id", seed)
        .select("id").as[Long].collect().toSeq
    val o1 = order(1, 7L)
    assert(o1.sorted == ids)               // a permutation, nothing dropped
    assert(o1 != ids)                      // actually shuffled
    assert(order(13, 7L) == o1)            // partition-layout invariant
    assert(order(13, 8L) != o1)            // a new seed is a new order
  }

  test("curriculum order: bits shards, complete ranks, reproducible interior") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // scores 0..6 → shard = bitlen(score+1): {0}→1, {1,2}→2, {3..6}→3
    val df = Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 6L), (6L, -5L))
      .toDF("id", "score")
    val got = Splits.curriculumOrder(df, "id", "score", seed = 3L)
      .select("id", "shard", "curriculum_rank")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got(1L)._1 == 1 && got(6L)._1 == 1) // negative clamps to easiest
    assert(got(2L)._1 == 2 && got(3L)._1 == 2)
    assert(got(4L)._1 == 3 && got(5L)._1 == 3)
    // ranks enumerate 1..|shard| inside each shard
    val byShard = got.values.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    byShard.foreach { case (_, rs) => assert(rs == (1L to rs.size)) }
    // partition-invariant and seed-sensitive, like the q92 order
    val o13 = Splits.curriculumOrder(df.repartition(13), "id", "score", seed = 3L)
      .select("id", "shard", "curriculum_rank")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(o13 == got)
    val other = Splits.curriculumOrder(df, "id", "score", seed = 4L)
      .select("id", "shard", "curriculum_rank")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(other.view.mapValues(_._1).toMap == got.view.mapValues(_._1).toMap) // shards unchanged
    assert(other != got) // but a new seed is a new interior order
  }

  test("stratified sample with defaultFraction 0 keeps only mapped strata") {
    val out = Splits.stratifiedSample(t(spark, sf, "documents"),
      "doc_id", "lang", Map("fr" -> 1.0))
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("fr"))
  }

  test("temperatureWeights: alpha=1 is identity, alpha=0 equalizes, count-preserving") {
    val docs = t(spark, sf, "documents").select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble

    val w1 = Splits.temperatureWeights(docs, "lang", alpha = 1.0)
    w1.values.foreach(w => assert(math.abs(w - 1.0) < 1e-9))

    val w0 = Splits.temperatureWeights(docs, "lang", alpha = 0.0)
    // target share is uniform: every group's expected rows = total/k
    val k = counts.size
    w0.foreach { case (g, w) =>
      assert(math.abs(counts(g) * w - total / k) < 1e-6 * total, s"group $g")
    }

    // expected output row count equals the input's at any alpha
    val w5 = Splits.temperatureWeights(docs, "lang", alpha = 0.5)
    val expTotal = counts.map { case (g, n) => n * w5(g) }.sum
    assert(math.abs(expTotal - total) < 1e-6 * total)
  }

  test("resampleByWeight: floor copies + fractional top-up, deterministic") {
    val docs = t(spark, sf, "documents").select(col("doc_id"), col("lang"))
    val n = docs.count()
    // weight 1.0 everywhere = identity (one copy_id 0 per row)
    val id = Splits.resampleByWeight(docs, "doc_id", "lang", Map.empty)
    assert(id.count() == n)
    assert(id.select("copy_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))

    // weight 2.5: every row 2 or 3 copies; realized total within the
    // 0.01%-grid tolerance of 2.5n; identical across invocations
    val up = Splits.resampleByWeight(docs, "doc_id", "lang",
      Map.empty, defaultWeight = 2.5)
    val perDoc = up.groupBy("doc_id").count()
      .collect().map(_.getLong(1)).distinct.sorted
    assert(perDoc.forall(c => c == 2L || c == 3L))
    assert(math.abs(up.count() - 2.5 * n) <= 0.05 * n)
    val again = Splits.resampleByWeight(docs, "doc_id", "lang",
      Map.empty, defaultWeight = 2.5)
    assert(up.orderBy("doc_id", "copy_id").collect().toSeq ==
      again.orderBy("doc_id", "copy_id").collect().toSeq)

    // weight 0 drops the group entirely
    val zeroed = Splits.resampleByWeight(docs, "doc_id", "lang",
      Map("en" -> 0.0), defaultWeight = 1.0)
    assert(zeroed.filter(col("lang") === "en").count() == 0)
    assert(zeroed.count() == docs.filter(col("lang") =!= "en").count())
  }

  test("row resample: copies replay floor(w) + deterministic fractional grid") {
    import spark.implicits._
    // weight 2.5× in basis points — every row gets 2 or 3 copies
    val d = (1L to 400L).map(i => (i, 25000L)).toDF("id", "w_bp")
    val out = Splits.resampleByRowWeight(d, "id", "w_bp")
    val byId = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.values.forall(c => c == 2L || c == 3L))
    // realized fraction tracks 0.5 on the deterministic grid
    val three = byId.values.count(_ == 3L).toDouble / byId.size
    assert(three > 0.4 && three < 0.6, s"frac=$three")
    // exact replay of the documented arithmetic
    byId.foreach { case (id, c) =>
      val grid = ((id % 2147483648L) * 2654435761L) % 4294967296L % 10000L
      assert(c == 2L + (if (grid < 5000L) 1L else 0L), s"id=$id")
    }
  }

  test("row resample: sub-1.0 weights thin deterministically; zero weight drops") {
    import spark.implicits._
    val d = (1L to 500L).map(i => (i, if (i <= 100) 0L else 4000L)).toDF("id", "w_bp")
    val out = Splits.resampleByRowWeight(d, "id", "w_bp")
    val ids = out.select("id").collect().map(_.getLong(0))
    assert(ids.forall(_ > 100L)) // zero-weight rows gone
    assert(ids.distinct.length == ids.length) // 0.4× → at most one copy
    val frac = ids.length.toDouble / 400
    assert(frac > 0.3 && frac < 0.5, s"frac=$frac")
  }

  test("row resample: copy_id enumerates 0..copies-1 and is partition-invariant") {
    import spark.implicits._
    val d = (1L to 100L).map(i => (i, 17000L + (i % 7) * 1000L)).toDF("id", "w_bp")
    val a = Splits.resampleByRowWeight(d, "id", "w_bp")
      .select("id", "copy_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Splits.resampleByRowWeight(d.repartition(13), "id", "w_bp")
      .select("id", "copy_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // per id: copy ids are exactly 0..n-1
    a.groupBy(_._1).foreach { case (_, s) =>
      val cs = s.map(_._2)
      assert(cs == (0L until cs.size).toSet)
    }
  }

  test("group k-fold: a group never straddles folds; folds cover 0..k-1; partition-invariant") {
    import spark.implicits._
    val rows = (1L to 600L).map(i => (i, s"grp${i % 37}"))
    val df = rows.toDF("id", "g")
    val a = Splits.withGroupKFold(df, "g", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // every row of a group shares the group's fold
    a.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).distinct.size == 1)
    }
    val folds = a.map(_._3).distinct.sorted
    assert(folds.forall(f => f >= 0 && f < 5) && folds.size >= 3)
    val b = Splits.withGroupKFold(df.repartition(13), "g", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(a.toSet == b)
  }

  test("neyman allocation: zero-variance stratum gets 0; allocation tracks N*sigma") {
    import spark.implicits._
    // flat: constant values (sigma 0); spread: values 0..9 repeating
    val rows = (1 to 100).map(i => ("flat", 50L)) ++
      (1 to 100).map(i => ("spread", (i % 10).toLong)) ++
      (1 to 400).map(i => ("spread4x", (i % 10).toLong))
    val m = Splits.neymanAllocation(rows.toDF("g", "v"), "g", "v", nTotal = 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(m("flat") == ((100L, 0.0, 0L)))
    // same sigma, 4x the rows -> 4x the allocation (80 vs 20)
    assert(m("spread")._2 == m("spread4x")._2)
    assert(m("spread")._3 == 20L && m("spread4x")._3 == 80L)
  }

  test("neyman allocation is partition-invariant (exact moments + ordered fold)") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (s"s${i % 5}", i % 37))
    val df = rows.toDF("g", "v")
    val a = Splits.neymanAllocation(df.coalesce(1), "g", "v", 1000L)
      .orderBy("g").collect().toSeq
    val b = Splits.neymanAllocation(df.repartition(13), "g", "v", 1000L)
      .orderBy("g").collect().toSeq
    assert(a == b && a.size == 5)
  }

  test("group k-fold sizes balance statistically at group-count scale") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, s"g$i")).toDF("id", "g") // singleton groups
    val sizes = Splits.withGroupKFold(df, "g", 5)
      .groupBy("fold").count().collect().map(_.getLong(1))
    assert(sizes.length == 5 && sizes.forall(n => n > 800 && n < 1200),
      s"unbalanced: ${sizes.toSeq}")
  }
}
