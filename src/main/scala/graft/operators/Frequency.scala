package graft.operators

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
  *     partition (Karp/Shenker/Papadimitriou counting via
  *     `Dataset.stat.freqItems` — state per task is O(1/support),
  *     independent of vocabulary), whose merge GUARANTEES every value
  *     with share > `support` survives as a candidate (false positives
  *     possible, false negatives impossible);
  *  2. exact counting then aggregates ONLY rows matching the ≤1/support
  *     candidates (the `isin` filter pushes to the scan), so the shuffle
  *     carries candidate keys, not the vocabulary.
  *
  * The result is EXACTLY the true top-k (count desc, value asc)
  * whenever the true k-th value's share exceeds `support` — the caller
  * sets `support` from that promise (e.g. top-20 words: any corpus's
  * 20th word is far above 0.1%). The oracle-facing q102 rides this
  * guarantee; FrequencySpec asserts equality against the full groupBy.
  */
object Frequency {

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
    * silently wrong answer. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
                   support: Double = 0.01): DataFrame = {
    require(k > 0 && support > 0 && support < 1, s"bad k=$k / support=$support")
    val n = df.count()
    val cand = df.stat.freqItems(Array(valueCol), support)
      .head().getSeq[Any](0)
    val verified = df.filter(col(valueCol).isin(cand: _*))
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
