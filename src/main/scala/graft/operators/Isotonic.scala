package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic regression (pool-adjacent-violators) over score bins — the
  * CALIBRATOR the audit family was missing: q224 measures how
  * mis-calibrated a score is (ECE), q225 turns a score into a
  * guaranteed-coverage gate, this FIXES the score — the monotone map
  * score → P(y=1 | score) that a ranker's output is passed through
  * before thresholding (Zadrozny & Elkan 2002; the standard production
  * calibration when Platt's sigmoid shape assumption doesn't hold).
  *
  * The fit uses the MINIMAX characterization of isotonic regression
  * (Robertson, Wright & Dykstra 1988, §1.2) instead of the sequential
  * PAV merge loop:
  *
  *   iso(b) = max_{j ≤ b} min_{k ≥ b} mean(pos, n over bins j..k)
  *
  * which is algebraically the PAV solution but DECLARATIVE: once the
  * corpus is reduced to per-bin exact (pos, n) counts, the fit is two
  * bounded grid joins over ≤ bins² intervals — no driver loop, no
  * sequential merge state, and Catalyst sees ordinary joins. Each
  * interval mean is one closing double division of exact BIGINTs, and
  * min/max over IEEE doubles are exact, so the fit replays
  * bit-identically cross-engine.
  *
  * Scale shape: ONE map-side-combined aggregate over the corpus (the
  * only corpus-scale stage); everything after runs on the bins-sized
  * grid (bins ≤ 100 ⇒ ≤ 10⁴ interval rows — broadcast-sized at any
  * corpus size). Empty bins simply don't appear; the minimax intervals
  * span them via cumulative counts, exactly as PAV pools across gaps. */
object Isotonic {

  /** Per observed bin: (bin, n, pos, rate, iso) with `iso` the
    * monotone non-decreasing calibrated rate. `scoreCol` must lie in
    * [0, 1); rows with NULL score or label are excluded (an unscored
    * row can't calibrate anything — NULL-in, nothing-out, the house
    * rule). */
  def pavBinned(df: DataFrame, scoreCol: String, labelCol: String,
                bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bad bins=$bins")
    val g = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(least(floor(col(scoreCol) * bins), lit(bins - 1))
        .cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("pos"))
    // bounded grid from here on: cumulative counts via a grid self-join
    // (≤ bins² rows — a window would work too, but the join keeps the
    // whole fit in one idiom and never creates a single-partition stage)
    val cum = g.as("a")
      .join(g.as("b"), col("b.bin") <= col("a.bin"))
      .groupBy(col("a.bin").as("bin"), col("a.n").as("n"), col("a.pos").as("pos"))
      .agg(sum(col("b.n")).as("cn"), sum(col("b.pos")).as("cp"))
    val ivl = cum.as("j").join(cum.as("k"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        ((col("k.cp") - col("j.cp") + col("j.pos")).cast("double") /
          (col("k.cn") - col("j.cn") + col("j.n")).cast("double")).as("avg"))
    val mn = ivl.join(g.select(col("bin").as("b")),
        col("j") <= col("b") && col("k") >= col("b"))
      .groupBy(col("j"), col("b")).agg(min(col("avg")).as("m"))
    val iso = mn.groupBy(col("b")).agg(max(col("m")).as("iso"))
    g.join(iso, col("bin") === col("b"))
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate"),
        col("iso"))
      .orderBy(col("bin"))
  }
}
