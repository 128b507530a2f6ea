package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate heavy hitters — exact top-k frequent values WITHOUT a
  * full-vocabulary groupBy.
  *
  * The full `groupBy(value).count().orderBy(...)` shuffles one row per
  * DISTINCT value; on a 100 TB token stream that vocabulary-sized
  * shuffle (and the skew of its hottest keys) is the cost. Instead:
  *
  *  1. one narrow pass builds a bounded frequent-items summary per
  *     partition (Misra-Gries / Karp-Shenker-Papadimitriou counting —
  *     state per task is O(1/support), independent of vocabulary) and
  *     the partition's row count in the same iterator sweep; the driver
  *     merge GUARANTEES every value with share > `support` survives as
  *     a candidate (false positives possible, false negatives
  *     impossible — the guarantee is preserved under summary merge,
  *     errors add);
  *  2. exact counting then aggregates ONLY rows matching the ≤2/support
  *     candidates (the `isin` filter pushes to the scan; the cap is
  *     sized for the TWO-phase merge error — see heavyHitters), so the
  *     shuffle carries candidate keys, not the vocabulary.
  *
  * The result is EXACTLY the true top-k (count desc, value asc)
  * whenever the true k-th value's share exceeds `support` — the caller
  * sets `support` from that promise (e.g. top-20 words: any corpus's
  * 20th word is far above 0.1%). The oracle-facing q102 rides this
  * guarantee; FrequencySpec asserts equality against the full groupBy.
  */
object Frequency {

  /** Misra-Gries insert with a bounded map (same merge algebra as
    * Spark's internal `FreqItemCounter`): above `cap` keys, admitting a
    * new key costs every survivor its minimum — the classic counter
    * decrement, so any key with true count > n/cap cannot be evicted
    * to zero. Works for merging whole summaries too (count > 1). */
  private def mgAdd(map: mutable.HashMap[Any, Long], key: Any,
                    count: Long, cap: Int): Unit = {
    map.get(key) match {
      case Some(c) => map(key) = c + count
      case None if map.size < cap => map(key) = count
      case None =>
        val minCount = if (map.isEmpty) 0L else map.values.min
        if (count >= minCount) {
          map(key) = count
          map.filterInPlace((_, v) => v > minCount)
          map.mapValuesInPlace((_, v) => v - minCount)
        } else {
          map.mapValuesInPlace((_, v) => v - count)
        }
    }
  }

  /** Exact top-k by frequency via sketch-then-verify. `valueCol` should
    * be the already-atomized value (explode upstream).
    *
    * UNCONDITIONALLY exact: the sketch guarantee (no false negatives
    * above `support`) makes the fast path correct only while the true
    * k-th value's share exceeds `support` — and that promise is CHECKED,
    * not assumed. If the verified k-th candidate count clears
    * `support·n`, any value that could outrank it had share > support
    * and therefore was a candidate, so the fast answer is the true
    * top-k. Otherwise the guarantee may have been broken and the
    * operator pays the full vocabulary groupBy instead of returning a
    * silently wrong answer.
    *
    * Cost: ONE narrow corpus pass (fused sketch + row count — `n` rides
    * the same iterator, no separate `df.count()` scan) + one
    * candidate-filtered pass for exact verification. The driver holds
    * partitions × (1/support) summary entries — KB-scale even at
    * thousands of tasks. */
  /** Count-min sketch build (Cormode, Muthukrishnan, "An Improved Data
    * Stream Summary: the Count-Min Sketch and its Applications",
    * J. Algorithms 2005): a depth×width grid of counters answering
    * point-frequency queries for ANY value from O(depth·width) state —
    * the complement of [[heavyHitters]] (which returns the top set but
    * cannot answer "how often did THIS token occur" for the long tail).
    * Guarantee: estimate ≥ true count always, ≤ true + εN with
    * probability 1−δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
    *
    * Deterministic replayable hashing (the engine's discipline — a
    * seeded-row variant of [[Splits.stringKey]]→hashBucket): row j maps
    * key → pmod((key + j·1000003)·KnuthC mod 2³², width). The sketch is
    * therefore a VALUE: buildable by any engine, mergeable by cell-wise
    * addition (counts are exact integer sums), and the oracle rebuilds
    * it bit-for-bit.
    *
    * Scale shape: one narrow hash projection + a (row, cell)-keyed
    * map-side-combined aggregate — the shuffle carries ≤ depth·width
    * rows regardless of vocabulary. */
  def countMinBuild(df: DataFrame, valueCol: String,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    val key = Splits.stringKey(col(valueCol).cast("string"))
    df.withColumn("__key", key)
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("cell",
        Splits.hashBucket(pmod(col("__key") + col("row") * 1000003L,
          lit(1000000007L)), width))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-frequency estimates for `terms` from a built sketch:
    * (term, est) where est = min over rows of the term's cell — the CMS
    * upper-bound estimate. The sketch joins in broadcast (depth·width
    * rows); absent cells read as 0. */
  def countMinEstimate(sketch: DataFrame, terms: DataFrame,
                       termCol: String, depth: Int = 4,
                       width: Int = 1024): DataFrame = {
    val key = Splits.stringKey(col(termCol).cast("string"))
    terms.withColumn("__key", key)
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("cell",
        Splits.hashBucket(pmod(col("__key") + col("row") * 1000003L,
          lit(1000000007L)), width))
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
                   support: Double = 0.01): DataFrame = {
    require(k > 0 && support > 0 && support < 1, s"bad k=$k / support=$support")
    // Two-phase error budget: per-partition sketches undercount by at
    // most Σ n_p/cap = n/cap, and replaying the summaries through one
    // more bounded merge adds another ≤ n/cap — so a value can be
    // evicted from the merged candidate set only if its true count is
    // ≤ 2n/cap. cap ≥ 2/support makes that bound ≤ support·n, which is
    // exactly what the soundness check below relies on (a single-pass
    // 1/support cap would let a value in (support, 2·support] vanish
    // while the check still passed — silently wrong top-k).
    val cap = math.max(k, math.ceil(2.0 / support).toInt)
    // one fused pass: per-partition (bounded summary, row count)
    val summaries = df.select(col(valueCol)).rdd.mapPartitions { it =>
      val m = new mutable.HashMap[Any, Long]
      var c = 0L
      it.foreach { r => mgAdd(m, r.get(0), 1L, cap); c += 1L }
      Iterator.single((m.toSeq, c))
    }.collect()
    val merged = new mutable.HashMap[Any, Long]
    var n = 0L
    summaries.foreach { case (m, c) =>
      n += c
      m.foreach { case (key, v) => mgAdd(merged, key, v, cap) }
    }
    val cand = merged.keys.toSeq
    // isin never matches NULL, so a frequent-null column needs the
    // null candidate verified through an explicit isNull disjunct —
    // otherwise null's exact count silently drops out of the top-k
    // while the soundness check can still pass.
    val (nullCand, nonNullCand) = cand.partition(_ == null)
    val candPred = {
      val base = if (nonNullCand.nonEmpty) col(valueCol).isin(nonNullCand: _*) else lit(false)
      if (nullCand.nonEmpty) base || col(valueCol).isNull else base
    }
    val verified = df.filter(candPred)
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .cache()
    val top = verified
      .orderBy(col("cnt").desc, col(valueCol))
      .limit(k)
    val topCounts = top.select(col("cnt")).collect().map(_.getLong(0))
    val sound = topCounts.length >= k && topCounts.min > support * n
    if (sound) top
    else df.groupBy(col(valueCol))           // guarantee broken: exact path
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(valueCol))
      .limit(k)
  }
}
