package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary health audits — the two standard checks a
  * training-data pipeline runs on a text corpus's TERM DISTRIBUTION
  * (complementing the value-distribution monitors: PSI [[Drift]],
  * KS, Benford, CUSUM [[ChangePoint]]):
  *
  *  - [[zipfFit]]: natural text follows Zipf's law — term frequency
  *    ≈ C·rank^(−s) with s ≈ 1 (Zipf 1949; Piantadosi 2014 surveys the
  *    evidence). A corpus whose fitted log-log slope sits far from −1,
  *    or whose R² is low, is structurally un-text-like (template spam,
  *    relabeled machine output, truncated vocab) — a cheap whole-corpus
  *    smoke alarm.
  *  - [[jsDivergence]]: Jensen–Shannon divergence (Lin 1991) between
  *    two corpora's term distributions — the SYMMETRIC, bounded
  *    ([0, ln 2]) alternative to KL for "did the vocabulary mix
  *    shift?", with per-term attribution so the verdict names the
  *    terms that moved (the PSI-attribution discipline applied to
  *    vocabulary).
  *
  * Oracle-parity rules (the house discipline): tokenization is the
  * gate family's `[a-z0-9]+` lowercase regex; every corpus-scale sum
  * of doubles goes through exact `decimal(28,12)` accumulation
  * (order-independent — the [[KeywordRank]] dsum idiom) and closes in
  * the shared DOUBLE domain; ranking keys are totally ordered
  * (freq desc, term) so replay is deterministic.
  *
  * Scale shape: both audits are the wordcount cost class — one
  * tokenize+explode pass and a term-keyed shuffle; everything after
  * runs on the vocab table (zipfFit on a bounded top-N slice). */
object VocabStats {

  /** Exact decimal accumulation of a double column (deterministic
    * under any aggregation order), closed back to double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(28,12)")).cast("double")

  private def terms(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
      .as("term"))

  /** OLS fit of ln(freq) on ln(rank) over the top `topN` terms — one
    * row: (n_terms, slope, intercept, r2), 6-dp. Natural text lands
    * slope ≈ −1 with r2 near 1.
    *
    * The rank window runs on the top-N slice ONLY (TakeOrdered brings
    * back `topN` rows; the single-partition window is topN-bounded by
    * construction, never corpus- or vocab-sized). Fitting the head of
    * the distribution is also statistically standard — the tail's
    * count-1 plateau is not Zipfian and would bias the slope. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 10 && topN <= 100000, s"bad topN=$topN")
    val tf = terms(df, textCol).groupBy(col("term"))
      .agg(count(lit(1)).as("f"))
    val top = tf.orderBy(col("f").desc, col("term")).limit(topN)
    val ranked = top.withColumn("r",
      row_number().over(Window.orderBy(col("f").desc, col("term"))))
    val pts = ranked.select(
      log(col("r").cast("double")).as("x"),
      log(col("f").cast("double")).as("y"))
    val s = pts.agg(count(lit(1)).as("n"), dsum(col("x")).as("sx"),
      dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
      dsum(col("x") * col("x")).as("sxx"),
      dsum(col("y") * col("y")).as("syy"))
    // close in the shared double domain: long·double products IEEE
    // both engines; n >= 10 distinct ranks makes varX strictly > 0
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    val covXY = col("n") * col("sxy") - col("sx") * col("sy")
    s.select(col("n").as("n_terms"),
      round(covXY / varX, 6).as("slope"),
      round((col("sy") - covXY / varX * col("sx")) / col("n"), 6)
        .as("intercept"),
      round(covXY * covXY / (varX * varY), 6).as("r2"))
  }

  /** Jensen–Shannon divergence between `ref`'s and `cur`'s term
    * distributions, with per-term attribution: the top `topContrib`
    * terms by contribution — (term, n_ref, n_cur, p_ref, p_cur,
    * contrib 9-dp) — plus the folded `jsd` (6-dp) repeated. Terms
    * absent from one side contribute via the standard 0·ln0 = 0
    * convention (their other-side mass still pulls the mixture). */
  def jsDivergence(ref: DataFrame, cur: DataFrame, textCol: String,
                   topContrib: Int = 20): DataFrame = {
    require(topContrib >= 1 && topContrib <= 1000, s"bad topContrib=$topContrib")
    val fr = terms(ref, textCol).groupBy(col("term"))
      .agg(count(lit(1)).as("n_ref"))
    val fc = terms(cur, textCol).groupBy(col("term"))
      .agg(count(lit(1)).as("n_cur"))
    val j = fr.join(fc, Seq("term"), "full")
      .select(col("term"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = j.agg(sum(col("n_ref")).cast("double").as("__tr"),
      sum(col("n_cur")).cast("double").as("__tc"))
    val c = j.crossJoin(broadcast(tot))
      .withColumn("p", col("n_ref").cast("double") / col("__tr"))
      .withColumn("q", col("n_cur").cast("double") / col("__tc"))
      // p + q > 0 on every joined row (a term exists on some side), so
      // the guarded logs never see a zero mixture
      .withColumn("contrib", lit(0.5) *
        (when(col("p") > 0,
          col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
          .otherwise(lit(0.0)) +
          when(col("q") > 0,
            col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
            .otherwise(lit(0.0))))
    val s = c.agg(dsum(col("contrib")).as("__jsd"))
    c.crossJoin(broadcast(s))
      .select(col("term"), col("n_ref"), col("n_cur"),
        round(col("p"), 6).as("p_ref"), round(col("q"), 6).as("p_cur"),
        round(col("contrib"), 9).as("contrib"),
        round(col("__jsd"), 6).as("jsd"))
      .orderBy(round(col("contrib"), 9).desc, col("term"))
      .limit(topContrib)
  }

  /** Lexical-diversity audit per group — the vocabulary-richness
    * complement to [[zipfFit]]'s shape test: type-token ratio and its
    * two length-corrected standards, root TTR (Guiraud 1954, R =
    * V/√N) and Herdan's C (1960, C = ln V / ln N). Raw TTR collapses
    * with corpus size (every new token repeats old types), so the
    * corrected forms are what a curator trends: a feed whose Herdan C
    * falls round-over-round is duplicating itself; one whose C jumps
    * is injecting noise vocabulary (the q277/q278 signals at
    * per-group granularity).
    *
    * Exactness: types and tokens are exact BIGINTs from one wordcount
    * aggregate; the three ratios are single closing divisions, 6-dp.
    *
    * Scale shape: ONE (group, term) map-side-combined count (the
    * wordcount cost class — vocab-bounded, not corpus-bounded) then a
    * groups-bounded close. No windows, no driver work. */
  def lexicalDiversity(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("__g"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
    toks.groupBy(col("__g"), col("term"))
      .agg(count(lit(1)).as("__f"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("types"), sum(col("__f")).as("tokens"))
      .filter(col("tokens") > 1)
      .select(col("__g").as(groupCol), col("types"), col("tokens"),
        round(col("types").cast("double") / col("tokens").cast("double"), 6)
          .as("ttr"),
        round(col("types").cast("double") /
          sqrt(col("tokens").cast("double")), 6).as("root_ttr"),
        round(log(col("types").cast("double")) /
          log(col("tokens").cast("double")), 6).as("herdan_c"))
      .orderBy(col(groupCol))
  }

  /** Vocabulary-richness estimators per group — "how much vocabulary
    * have we NOT seen yet": Chao1 lower-bounds the true type count
    * from the singleton/doubleton censuses (Chao 1984, bias-corrected
    * form — defined even with no doubletons), and the Good–Turing
    * singleton mass N₁/N estimates the probability the NEXT token is
    * an unseen type (Good 1953) — the two numbers that tell a curator
    * whether a source's vocabulary is saturated (crawl more adds
    * nothing) or still growing (the q216 vocab-growth curve's closing
    * scalars):
    *
    *   chao1 = V + N₁(N₁−1) / (2(N₂+1))
    *   unseen_mass = N₁/N
    *
    * Exactness: V, N₁, N₂, N are exact BIGINTs off the wordcount
    * aggregate plus a frequency-census aggregate (both map-side
    * combined, vocab-bounded); the two closes are single double
    * expressions, 6-dp. */
  def richness(df: DataFrame, groupCol: String,
               textCol: String): DataFrame = {
    val tf = df.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("__g"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
      .groupBy(col("__g"), col("term"))
      .agg(count(lit(1)).as("__f"))
    tf.groupBy(col("__g"))
      .agg(count(lit(1)).as("types"), sum(col("__f")).as("tokens"),
        sum(when(col("__f") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("__f") === 2, 1L).otherwise(0L)).as("n2"))
      .filter(col("tokens") > 0)
      .select(col("__g").as(groupCol), col("types"), col("tokens"),
        col("n1"), col("n2"),
        round(col("types").cast("double") +
          col("n1").cast("double") * (col("n1") - 1).cast("double") /
            (lit(2.0) * (col("n2") + 1).cast("double")), 6).as("chao1"),
        round(col("n1").cast("double") / col("tokens").cast("double"), 6)
          .as("unseen_mass"))
      .orderBy(col(groupCol))
  }

  /** Repeat-concentration per group — the FREQUENCY-SPECTRUM face the
    * ratio family ([[lexicalDiversity]]) and the unseen-mass face
    * ([[richness]]) both miss: two sources with identical TTR can
    * differ wildly in how repetition CONCENTRATES (one word used 1000
    * times vs 1000 words used once each beyond the shared types).
    *
    *   Yule's K  = 10⁴ · (Σ_f f²·V_f − N) / N²   (repeat rate,
    *               length-invariant — Yule 1944)
    *   Simpson D = Σ_f V_f·f·(f−1) / (N·(N−1))   (probability two
    *               random tokens are the same type)
    *
    * Both are exact integer functionals of the frequency spectrum V_f
    * (how many types occur f times); K is Simpson's D rescaled free of
    * the −1 correction, reported together because K is the stylometry
    * convention and D the ecology one. High K flags boilerplate/
    * template sources — the dedup-adjacent read a curation pass ranks
    * sources by.
    *
    * Exactness: Σ f²·V_f = Σ over types of f² — exact BIGINT off the
    * wordcount census (no separate spectrum pass needed); two closing
    * double divisions, 6-dp. Requires ≥ 2 tokens per group (D's
    * denominator). Scale shape: one tokenize + one map-side-combined
    * (group, term) census + one group rollup. */
  def concentration(df: DataFrame, groupCol: String,
                    textCol: String): DataFrame = {
    val tf = df.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("__g"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
      .groupBy(col("__g"), col("term"))
      .agg(count(lit(1)).as("__f"))
    tf.groupBy(col("__g"))
      .agg(count(lit(1)).as("types"), sum(col("__f")).as("tokens"),
        // cast BEFORE the multiply (the Extremes.gumbelBlockMaxima rule):
        // long*long overflows ANSI once a term repeats ~3.04e9 times
        sum(col("__f").cast("decimal(38,0)") * col("__f")).as("__sff"),
        sum(col("__f").cast("decimal(38,0)") * (col("__f") - 1)).as("__sff1"))
      .filter(col("tokens") >= 2)
      .select(col("__g").as(groupCol), col("types"), col("tokens"),
        round(lit(10000.0) * (col("__sff") - col("tokens")).cast("double") /
          (col("tokens").cast("double") * col("tokens").cast("double")), 6)
          .as("yule_k"),
        round(col("__sff1").cast("double") /
          (col("tokens").cast("double") * (col("tokens") - 1).cast("double")),
          6).as("simpson_d"))
      .orderBy(col(groupCol))
  }
}
