package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Little's law audit — L = λ·W, the one identity every capacity
  * dashboard leans on, CHECKED against the data instead of assumed:
  * λ·W is computed from the session table (throughput × mean
  * duration), while L is measured INDEPENDENTLY as the average
  * concurrency sampled at minute boundaries. The two agree exactly in
  * the steady-state limit; their relative gap on real data prices the
  * edge effects (sessions straddling the observation window,
  * sub-minute sessions invisible to the sampler) that make the
  * dashboard number drift from throughput×latency — the audit says
  * whether "concurrent users" and "arrival rate × session length" are
  * the same number on THIS corpus, before anyone divides by one to
  * forecast the other.
  *
  * The sampler needs NO grid join: a session [s, e) in microseconds
  * covers exactly e div 6e7 − s div 6e7 minute boundaries, so sampled
  * concurrency is one exact integer per session and
  * L_sampled = Σ boundaries / (boundaries in the span). Everything is
  * exact longs until four closing double divisions.
  *
  * Scale shape: one sessionize window pass (the q24 machinery) + one
  * global aggregate; no grid materialization at any scale. */
object Queueing {

  /** One row: (n_sessions, span_sec, lambda_per_hour, w_mean_sec,
    * l_identity, l_sampled, rel_gap). Sessions split on `gapUs` idle
    * time per user (default 6 h — the house q24 rule). */
  def littleLaw(events: DataFrame, userCol: String, tsCol: String,
                gapUs: Long = 6L * 3600 * 1000000): DataFrame = {
    require(gapUs > 0, s"littleLaw: gapUs=$gapUs must be positive")
    val ev = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__t"))
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__t") - col("__prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(run))
      .groupBy(col("__u"), col("__sid"))
      .agg(min(col("__t")).as("__s"), max(col("__t")).as("__e"))
    val agg = sessions.agg(count(lit(1)).as("n"),
      sum(col("__e") - col("__s")).as("dur_us"),
      sum(expr("__e div 60000000") - expr("__s div 60000000")).as("bnd"),
      min(col("__s")).as("t0"), max(col("__e")).as("t1")).head()
    val n = agg.getLong(0)
    require(n >= 2, s"littleLaw: only $n session(s)")
    val durUs = agg.getLong(1)
    val bnd = agg.getLong(2)
    val t0 = agg.getLong(3); val t1 = agg.getLong(4)
    val spanUs = t1 - t0
    require(spanUs > 0, "littleLaw: zero observation span")
    val spanBnd = t1 / 60000000L - t0 / 60000000L
    require(spanBnd > 0, "littleLaw: span shorter than one minute")
    // all-instantaneous sessions carry zero occupancy: rel_gap's
    // denominator vanishes — refuse rather than publish NaN/Infinity
    require(durUs > 0, "littleLaw: zero total session duration")
    val lIdentity = durUs.toDouble / spanUs
    val lSampled = bnd.toDouble / spanBnd
    val spark = events.sparkSession
    import spark.implicits._
    Seq((n, spanUs / 1000000L,
      n.toDouble / (spanUs.toDouble / 3.6e9),
      durUs.toDouble / n / 1e6,
      lIdentity, lSampled,
      (lSampled - lIdentity) / lIdentity))
      .toDF("n_sessions", "span_sec", "lambda_per_hour", "w_mean_sec",
        "l_identity", "l_sampled", "rel_gap")
      .select(col("n_sessions"), col("span_sec"),
        round(col("lambda_per_hour"), 6).as("lambda_per_hour"),
        round(col("w_mean_sec"), 6).as("w_mean_sec"),
        round(col("l_identity"), 6).as("l_identity"),
        round(col("l_sampled"), 6).as("l_sampled"),
        round(col("rel_gap"), 6).as("rel_gap"))
  }
}
