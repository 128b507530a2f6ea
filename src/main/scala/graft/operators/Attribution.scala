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
}
