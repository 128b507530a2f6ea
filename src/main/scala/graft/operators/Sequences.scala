package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over ordered event streams.
  *
  * The reference's completion history is an ordered per-session message
  * sequence (Session.Messages, reference SharedLib/Models/Session.cs) that
  * its UI only replays; an analytics engine over the same data answers
  * "what follows what" — the first-order Markov transition structure of
  * user/session behavior (funnel drop-off, navigation loops, next-action
  * prediction priors).
  *
  * Scale shape: one window shuffle keyed by the (high-cardinality)
  * sequence id to order each sequence locally, then one map-side-combined
  * aggregate over (from, to) pairs whose cardinality is |states|² — tiny
  * regardless of corpus size. No self-join, no explode of full sequences,
  * no driver state: 100 TB of events costs two shuffles, the second one
  * bounded by the state vocabulary.
  */
object Sequences {

  /** Inter-event regularity audit — the cheap bot/script detector a
    * corpus of behavioral events needs before anything trains on it:
    * human inter-event gaps are bursty (CV ≈ or > 1), schedulers and
    * replay scripts are metronomic (CV ≈ 0). Per unit with at least
    * `minGaps` gaps, the squared coefficient of variation from exact
    * integer gap moments:
    *
    *   CV² = n·Σg²/(Σg)² − 1
    *
    * Output: the `k` most regular units (ascending CV², unit id ties)
    * — a TakeOrdered bound, never a corpus-sized list — each with its
    * gap stats and the flag CV² < threshold², plus (n_evaluated,
    * n_flagged) repeated for the fleet-level read.
    *
    * Exactness: gaps are whole seconds (the epoch floor); n, Σg, Σg²
    * are exact BIGINTs per unit; CV² is one double expression from
    * those integers (identical in the oracle), and the flag compares
    * that double to the squared threshold — same bits both engines.
    *
    * Scale shape: ONE Exchange(unit) + lag window (the sessionizer's
    * shuffle) then a per-unit map-side-combined aggregate; the top-k
    * is TakeOrderedAndProject, the summary one more aggregate over
    * the per-unit frame (two jobs over the same shuffle — the totals
    * are the audit, the frame never collects). */
  def gapRegularity(df: DataFrame, userCol: String, tsCol: String,
                    minGaps: Int, cvThreshold: Double,
                    k: Int): DataFrame = {
    require(minGaps >= 2, s"gapRegularity: minGaps=$minGaps (need >= 2)")
    require(cvThreshold > 0, s"gapRegularity: cvThreshold=$cvThreshold")
    require(k >= 1 && k <= 10000, s"gapRegularity: k=$k outside [1, 1e4]")
    val ev = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        unix_timestamp(col(tsCol)).as("__s"))
    val w = Window.partitionBy(col("__u")).orderBy(col("__s"))
    val perUser = ev
      .withColumn("__gap", col("__s") - lag(col("__s"), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col("__u"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__gap")).as("__s1"),
        sum(col("__gap") * col("__gap")).as("__s2"))
      .filter(col("n_gaps") >= minGaps && col("__s1") > 0)
      .withColumn("cv2",
        col("n_gaps").cast("double") * col("__s2").cast("double") /
          (col("__s1").cast("double") * col("__s1").cast("double")) -
          lit(1.0))
      .withColumn("flagged", col("cv2") < cvThreshold * cvThreshold)
    val tot = perUser.agg(count(lit(1)).as("__ne"),
      sum(when(col("flagged"), 1L).otherwise(0L)).as("__nf")).head()
    perUser
      .select(col("__u").as(userCol), col("n_gaps"),
        col("__s1").as("sum_gap_s"), round(col("cv2"), 6).as("cv2"),
        col("flagged"), lit(tot.getLong(0)).as("n_evaluated"),
        lit(tot.getLong(1)).as("n_flagged"))
      .orderBy(col("cv2"), col(userCol))
      .limit(k)
  }

  /** Session gap-threshold sensitivity — the audit that grounds the
    * q24/q119 sessionizers' one magic number: session counts are a
    * step function of the inactivity threshold, and picking 30 min
    * because "everyone does" silently merges or shreds sessions. One
    * pass over the per-user gap distribution prices EVERY candidate
    * threshold: sessions(θ) = users + #{gaps > θ} (each over-threshold
    * gap starts one more session).
    *
    * Exactness: the gap census (whole seconds via the epoch floor —
    * the q296 timestamp contract) and the per-threshold counts are
    * exact BIGINTs; events-per-session is the only double (6-dp).
    *
    * Scale shape: ONE Exchange(user) + lag window builds the gaps
    * (the sessionizer's own shuffle), then one map-side-combined gap
    * census; the thresholds evaluate as conditional aggregates over
    * census rows — adding a candidate threshold costs nothing. */
  def gapSensitivity(df: DataFrame, userCol: String, tsCol: String,
                     thresholdsSec: Seq[Long]): DataFrame = {
    require(thresholdsSec.nonEmpty && thresholdsSec.size <= 64,
      s"gapSensitivity: ${thresholdsSec.size} thresholds outside [1, 64]")
    require(thresholdsSec == thresholdsSec.sorted &&
      thresholdsSec.distinct == thresholdsSec,
      "gapSensitivity: thresholds must be strictly ascending")
    require(thresholdsSec.forall(_ > 0), "gapSensitivity: threshold <= 0")
    val spark = df.sparkSession
    val ev = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        unix_timestamp(col(tsCol)).as("__s"))
    val w = Window.partitionBy(col("__u")).orderBy(col("__s"))
    // a NULL gap marks each user's first event, so ONE census carries
    // everything: n_users = c(NULL), n_events = Σc, and every
    // threshold reads the over-threshold tail
    val gaps = ev
      .withColumn("__gap", col("__s") - lag(col("__s"), 1).over(w))
      .groupBy(col("__gap")).agg(count(lit(1)).as("__c"))
    Pinned.withCheckpoint(gaps) { census =>
      import spark.implicits._
      val tot = census.agg(sum(col("__c")).as("n_events"),
        coalesce(sum(when(col("__gap").isNull, col("__c"))), lit(0L))
          .as("n_users")).head()
      val (nEvents, nUsers) = (tot.getLong(0), tot.getLong(1))
      require(nUsers > 0, "gapSensitivity: no (user, ts) rows")
      val thr = thresholdsSec.toDF("threshold_s")
      val breaks = census.filter(col("__gap").isNotNull)
        .crossJoin(broadcast(thr))
        .groupBy(col("threshold_s"))
        .agg(sum(when(col("__gap") > col("threshold_s"), col("__c"))
          .otherwise(0L)).as("__breaks"))
      // left join from the thresholds: a gapless corpus (every user a
      // single event) still reports one row per threshold
      val out = thr.join(breaks, Seq("threshold_s"), "left")
        .select(col("threshold_s"), lit(nUsers).as("n_users"),
          lit(nEvents).as("n_events"),
          (lit(nUsers) + coalesce(col("__breaks"), lit(0L)))
            .as("n_sessions"))
        .withColumn("events_per_session",
          round(lit(nEvents).cast("double") /
            col("n_sessions").cast("double"), 6))
        .orderBy(col("threshold_s"))
      // re-emit before the pin releases (the plan reads the checkpoint)
      Grids.collectBounded(out, "gapSensitivity thresholds", maxRows = 64)
    }
  }

  /** First-order transition counts and probabilities.
    *
    * For each sequence (grouped by `partitionCols`, ordered by
    * `orderCols`), count consecutive `stateCol` pairs. `prob` is the
    * row-conditional transition probability P(to | from), rounded to 6
    * decimals (the single fp op; counts stay exact BIGINT).
    */
  def transitions(df: DataFrame, partitionCols: Seq[String],
                  orderCols: Seq[String], stateCol: String): DataFrame = {
    require(partitionCols.nonEmpty && orderCols.nonEmpty, "need keys")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val counts = df
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_state"))
    counts.withColumn("prob",
      round(col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"), 6))
  }

  /** Top transitions per source state (ties broken by target state) —
    * the "most likely next action" table a product-analytics user asks
    * for. One extra window over the |states|²-bounded counts table. */
  def topTransitions(df: DataFrame, partitionCols: Seq[String],
                     orderCols: Seq[String], stateCol: String, k: Int): DataFrame = {
    val t = transitions(df, partitionCols, orderCols, stateCol)
    val w = Window.partitionBy(col("from_state"))
      .orderBy(col("n").desc, col("to_state"))
    t.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sequential-pattern SUPPORT for length-2 patterns — the
    * sequence-mining complement of [[transitions]]: transitions count
    * OCCURRENCES (a single user looping A→B 50 times dominates);
    * support counts the SEQUENCES (users) containing the pattern at
    * least once — the GSP/SPADE measure (Agrawal & Srikant 1996, the
    * association-rule support lifted to ordered data). "45% of users
    * who view then purchase" is a support statement; the q156 matrix
    * cannot make it.
    *
    * Per (a, b): (a, b, n_occurrences, support, support_frac) — exact
    * counts, one closing division. One lag window keyed by the
    * sequence partition (never global), one |states|²-bounded
    * aggregate. */
  def sequenceSupport(df: DataFrame, partitionCols: Seq[String],
                      orderCols: Seq[String], stateCol: String): DataFrame = {
    require(partitionCols.nonEmpty && orderCols.nonEmpty, "need keys")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // multi-column distinct counts the KEY TUPLES natively — any
    // separator-join conflates ("ab","c") with ("a","bc") when the
    // separator can occur in keys, and concat_ws silently skips NULLs
    val seqs = df.agg(countDistinct(partitionCols.map(col).head,
      partitionCols.map(col).tail: _*).as("__total"))
    val pairs = df
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull)
    pairs.groupBy(col("__from").as("a"), col(stateCol).as("b"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(partitionCols.map(col).head,
          partitionCols.map(col).tail: _*).as("support"))
      .crossJoin(broadcast(seqs))
      .withColumn("support_frac",
        round(col("support").cast("double") / col("__total").cast("double"), 6))
      .drop("__total")
      .orderBy(col("a"), col("b"))
  }

  /** Entropy rate of the first-order chain — the PREDICTABILITY scalar
    * neither [[transitions]] (a matrix) nor [[sequenceSupport]] (a
    * pattern table) gives: H = −Σ_f π̂(f)·Σ_t p(t|f)·ln p(t|f), the
    * plug-in conditional entropy of the next state given the current
    * one (Cover & Thomas §4.2; π̂ is the empirical from-state mass). A
    * feed of bots reads near 0 (deterministic loops); uniform noise
    * reads ln K; a curator trends `predictability` = 1 − H/ln K per
    * corpus version — rising predictability in "organic" traffic is a
    * bot-cohort signal (q156's matrix shows WHERE, this says HOW MUCH).
    *
    * Exactness: the K² transition census is exact BIGINTs; per-from
    * entropy terms fold in TO-STATE order and the rate folds in
    * FROM-STATE order (the q279 double-fold discipline), 6-dp. Output:
    * one row per from state (from_state, n_from, h_cond) with pooled
    * (h_rate, h_max, predictability) repeated.
    *
    * Scale shape: the same ONE window shuffle + K²-bounded census as
    * [[transitions]]; everything after runs on the states grid. */
  def transitionEntropy(df: DataFrame, partitionCols: Seq[String],
                        orderCols: Seq[String],
                        stateCol: String): DataFrame = {
    require(partitionCols.nonEmpty && orderCols.nonEmpty, "need keys")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // ONE window pass: the states-squared census pins (the per-from
    // fold, the K_to distinct and the pooled fold otherwise re-run the
    // lag window over the corpus); the K-row result re-emits
    val spark = df.sparkSession
    Pinned.withCheckpoint(df
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull && col(stateCol).isNotNull)
      .groupBy(col("__from").as("from_state"),
        col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("__n"))
    ) { counts =>
    val perFrom = counts
      .groupBy(col("from_state"))
      .agg(sum(col("__n")).as("n_from"),
        collect_list(struct(col("to_state"), col("__n"))).as("__cells"))
      .withColumn("h_cond", aggregate(
        transform(array_sort(col("__cells")), p =>
          -(p.getField("__n").cast("double") / col("n_from")) *
            log(p.getField("__n").cast("double") /
              col("n_from").cast("double"))),
        lit(0.0), (acc, x) => acc + x))
      .drop("__cells", "__chk")
    val kTo = counts.select(col("to_state")).distinct().count()
    val pooled = perFrom.agg(sum(col("n_from")).as("__nn"),
      aggregate(
        transform(array_sort(collect_list(struct(col("from_state"),
          col("n_from"), col("h_cond")))),
          p => p.getField("n_from").cast("double") *
            p.getField("h_cond")),
        lit(0.0), (acc, x) => acc + x).as("__hsum"))
      .select((col("__hsum") / col("__nn").cast("double")).as("__hr"))
    val hMax = math.log(kTo.toDouble)
    val out = perFrom.crossJoin(broadcast(pooled))
      .select(col("from_state"), col("n_from"),
        round(col("h_cond"), 6).as("h_cond"),
        round(col("__hr"), 6).as("h_rate"),
        round(lit(hMax), 6).as("h_max"),
        round(when(lit(hMax) > 0, lit(1.0) - col("__hr") / lit(hMax))
          .otherwise(lit(0.0)), 6).as("predictability"))
      .orderBy(col("from_state"))
    Grids.collectBounded(out, "transition state grid")
    }
  }
}
