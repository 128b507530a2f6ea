package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — which CHANNEL gets credit for a
  * conversion: every conversion event credits the touch events on the
  * same user's path since their previous conversion (the standard
  * conversion-window contract), under the three classic models at once
  * (first-touch, last-touch, linear). The operator a growth dashboard
  * reads next to [[Funnel]]: the funnel says WHERE users drop, this
  * says which acquisition channel to pay.
  *
  * Path assignment is ONE window pass — each touch finds its NEXT
  * conversion per user (no self-join): deterministic event order
  * (ts, event_id) breaks same-timestamp ties, a touch after the user's
  * last conversion credits nothing, and a conversion with no preceding
  * touch takes no credit row (reported in `n_unattributed`).
  *
  * Exactness: first/last credits are exact BIGINT counts (the
  * first/last touch per path is min/max by the deterministic order).
  * Linear credit (1/n per touch) is fractional BY DEFINITION; it folds
  * over the bounded (channel, cnt, n_touches) census in census order —
  * each cell's K·cnt/n double is computed identically in any engine
  * and the fold order is pinned, so the total replays bit-for-bit (the
  * q279 sorted-fold discipline on a grid, never on corpus rows).
  *
  * Scale shape: one user-keyed window shuffle (the sessionize cost),
  * one map-side-combined census onto the channels×paths-shape grid;
  * the close runs on grid rows. */
object Attribution {

  /** Per channel: (channel, first_touch, last_touch, linear, touches)
    * with (n_conversions, n_attributed, n_unattributed) repeated;
    * ordered by channel. */
  def credit(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String, convType: String): DataFrame = {
    // the event table's own unique id is the tie key AND the conversion
    // key — deterministic on any partitioning, SQL-replayable
    val keyed = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(typeCol).as("__ch"), col(idCol).cast("long").as("__eid"),
        (col(typeCol) === convType).as("__conv"))
    val wNext = Window.partitionBy(col("__u"))
      .orderBy(col("__ts").asc, col("__eid").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val assigned = keyed
      // each event's next conversion id (itself, for a conversion)
      .withColumn("__cid",
        first(when(col("__conv"), col("__eid")), ignoreNulls = true)
          .over(wNext))
      .filter(col("__cid").isNotNull)
    val touches = assigned.filter(!col("__conv"))
    val convs = assigned.filter(col("__conv"))
    val nConv = convs.count()
    // per (conversion, channel) touch counts + per-conversion totals
    val perConv = touches.groupBy(col("__cid"), col("__ch"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("__ts"), col("__eid"))).as("__firstk"),
        max(struct(col("__ts"), col("__eid"))).as("__lastk"))
    val tot = touches.groupBy(col("__cid"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col("__ts"), col("__eid"))).as("__first"),
        max(struct(col("__ts"), col("__eid"))).as("__last"))
    val cells = perConv.join(tot, "__cid")
      .select(col("__ch"), col("__cnt"), col("__n"),
        (col("__firstk") === col("__first")).cast("long").as("__isFirst"),
        (col("__lastk") === col("__last")).cast("long").as("__isLast"))
    // bounded census: (channel, cnt, n) cells with K conversions each;
    // first/last counts are exact sums
    val census = cells.groupBy(col("__ch"), col("__cnt"), col("__n"))
      .agg(count(lit(1)).as("__k"), sum(col("__isFirst")).as("__f"),
        sum(col("__isLast")).as("__l"))
    val perChannel = census.groupBy(col("__ch"))
      .agg(sum(col("__f")).as("first_touch"),
        sum(col("__l")).as("last_touch"),
        sum(col("__k") * col("__cnt")).as("touches"),
        // linear: fold K·cnt/n over the grid in (cnt, n) order
        aggregate(
          transform(array_sort(collect_list(struct(col("__cnt"),
            col("__n"), col("__k")))),
            p => p.getField("__k").cast("double") *
              p.getField("__cnt").cast("double") /
              p.getField("__n").cast("double")),
          lit(0.0), (acc, x) => acc + x).as("__lin"))
    val attributed = tot.count()
    perChannel
      .select(col("__ch").as("channel"), col("first_touch"),
        col("last_touch"), round(col("__lin"), 6).as("linear"),
        col("touches"),
        lit(nConv).as("n_conversions"),
        lit(attributed).as("n_attributed"),
        lit(nConv - attributed).as("n_unattributed"))
      .orderBy(col("channel"))
  }

  /** Data-driven Shapley attribution (Shapley 1953 values on the
    * exposure-set conversion game — Zhao, Mahboobi & Bagheri 2018):
    * the position models in [[credit]] hard-code WHO gets paid;
    * Shapley derives it from observed conversion RATES per exposure
    * COALITION. Each unit (user) reduces to its exposure-set bitmask
    * over the k audited channels plus a converted flag; the coalition
    * value v(S) is the observed conversion rate of units exposed to
    * EXACTLY S, and channel i earns
    *
    *   φ_i = Σ_{S ⊆ C∖{i}} |S|!(k−1−|S|)!/k! · (v(S∪{i}) − v(S))
    *
    * Convention (documented, the paper's pragmatic choice): a
    * coalition never observed contributes v = 0 — no evidence, no
    * credit; with every mask observed, Σφ_i = v(C) − v(∅) exactly
    * (efficiency, spec-pinned).
    *
    * Exactness: ONE corpus pass — per-unit masks via bit_or then a
    * map-side-combined (mask, converted) census ≤ 2ᵏ rows; the Shapley
    * fold runs driver-side in ascending-mask order with factorial
    * weights as exact integer ratios, v as the one double division
    * per cell; both engines replay the identical fold. k ≤ 8.
    *
    * Output: one row per channel (channel, shapley, n_exposed,
    * x_exposed, rate_exposed) with (n_units, k, v_full, v_empty)
    * repeated. */
  def shapley(events: DataFrame, unitCol: String, channelCol: String,
              convChannel: String, channels: Seq[String]): DataFrame = {
    val k = channels.size
    require(k >= 2 && k <= 8, s"shapley: $k channels outside [2, 8]")
    require(channels.distinct.size == k, "shapley: duplicate channels")
    require(!channels.contains(convChannel),
      "shapley: the conversion channel cannot also be a touch channel")
    val rowBit = channels.zipWithIndex
      .map { case (ch, i) =>
        when(col(channelCol) === ch, lit(1L << i)).otherwise(0L) }
      .reduce(_ + _)
    val census = events
      .filter(col(unitCol).isNotNull && col(channelCol).isNotNull)
      .groupBy(col(unitCol))
      .agg(bit_or(rowBit).as("__mask"),
        max(when(col(channelCol) === convChannel, 1L).otherwise(0L))
          .as("__conv"))
      .groupBy(col("__mask"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__x"))
    val spark = events.sparkSession
    Pinned.withCheckpoint(census) { cen =>
      val cells = Grids.collectBounded(cen, "shapley mask census",
        maxRows = 1 << 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      require(cells.nonEmpty, "shapley: no units")
      val nUnits = cells.map(_._2).sum
      val v: Map[Long, Double] = cells.map { case (m, n, x) =>
        m -> x.toDouble / n.toDouble }.toMap
      def fact(x: Int): Long = (1 to x).foldLeft(1L)(_ * _)
      val fk = fact(k)
      def vOf(m: Long): Double = v.getOrElse(m, 0.0)
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.types.{StructType, StructField,
        StringType, LongType, DoubleType}
      val full = (1L << k) - 1
      val rows = channels.zipWithIndex.map { case (ch, i) =>
        val bit = 1L << i
        var phi = 0.0
        var s = 0L
        while (s <= full) {
          if ((s & bit) == 0) {
            val w = (fact(java.lang.Long.bitCount(s)) *
              fact(k - 1 - java.lang.Long.bitCount(s))).toDouble /
              fk.toDouble
            phi += w * (vOf(s | bit) - vOf(s))
          }
          s += 1
        }
        val exposed = cells.filter(c => (c._1 & bit) != 0)
        val nExp = exposed.map(_._2).sum
        val xExp = exposed.map(_._3).sum
        org.apache.spark.sql.Row(ch, phi, nExp, xExp,
          if (nExp == 0) null else xExp.toDouble / nExp.toDouble,
          nUnits, k.toLong, vOf(full), vOf(0L))
      }
      spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("channel", StringType),
        StructField("shapley", DoubleType),
        StructField("n_exposed", LongType),
        StructField("x_exposed", LongType),
        StructField("rate_exposed", DoubleType),
        StructField("n_units", LongType),
        StructField("k", LongType),
        StructField("v_full", DoubleType),
        StructField("v_empty", DoubleType))))
        .select(col("channel"), round(col("shapley"), 6).as("shapley"),
          col("n_exposed"), col("x_exposed"),
          round(col("rate_exposed"), 6).as("rate_exposed"),
          col("n_units"), col("k"), round(col("v_full"), 6).as("v_full"),
          round(col("v_empty"), 6).as("v_empty"))
        .orderBy(col("channel"))
    }
  }
}
