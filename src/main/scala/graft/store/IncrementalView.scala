package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: keep a grouped aggregate
  * table (COUNT / SUM / MIN / MAX, optionally an HLL distinct sketch)
  * in sync with a mutating fact table by applying the CHANGE FEED's
  * deltas — never rescanning the fact. (The reference maintains exactly
  * one such view by hand: `customers.salesOrderCount` is bumped on
  * every order write, MongoDbService.cs:370-392; this is that pattern
  * generalized and made transactional against the versioned store.)
  *
  * Delta algebra per changed key: insert contributes (+1, +v_new),
  * delete (−1, −v_old), update (0, v_new − v_old). COUNT/SUM are
  * self-inverse, so their maintenance is pure delta arithmetic. MIN/MAX
  * are NOT (a removed value below the minimum says nothing about the
  * new minimum), so they maintain incrementally — inserts can only
  * improve an extremum (`least`/`greatest`) — with a per-group RECOUNT
  * FALLBACK only for groups whose current extremum may have left
  * (removed_min ≤ state_min or removed_max ≥ state_max): the recount
  * scans the new snapshot column-pruned and semi-joined to just those
  * groups. The distinct sketch (Spark's HLL union — mergeable) unions
  * insert-only deltas for free and recounts any group that saw a
  * removal (sketches are insert-only structures). AVG derives from
  * SUM/COUNT at read time ([[derived]]) — storing it would denormalize
  * a computable column.
  *
  * After-images come from [[DocumentStore.changeFeed]]; BEFORE-images
  * come from one narrow column-pruned scan of the `fromV` snapshot
  * semi-joined to the epoch's touched keys — no fact-table shuffle.
  * Group deltas aggregate map-side to group cardinality, then merge
  * into the state table with one keyed upsert; groups emptied by the
  * epoch leave the view through the keyed anti-join delete (the delete
  * keys never visit the driver). Sums accumulate in DECIMAL so the
  * maintained state is bit-identical to a from-scratch recompute on
  * any partitioning/engine — which is exactly what the gate asserts.
  */
object IncrementalView {

  /** Initialize the state table from a full scan (one-time). */
  def initialize(src: DocumentStore, table: String, state: DocumentStore,
                 stateTable: String, groupCol: String, valCol: String,
                 distinctCol: Option[String] = None): Unit =
    state.create(stateTable, aggregate(src.read(table), groupCol, valCol, distinctCol))

  private def aggregate(df: DataFrame, groupCol: String, valCol: String,
                        distinctCol: Option[String]): DataFrame = {
    val dec = col(valCol).cast("decimal(18,2)")
    val aggs = Seq(
      count(lit(1)).as("cnt"),
      sum(dec).as("sum_val"),
      min(dec).as("min_val"),
      max(dec).as("max_val")) ++
      distinctCol.map(c => hll_sketch_agg(col(c)).as("nd_sketch"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time derived columns: `avg_val` (double, SUM/COUNT) and — when
    * the view tracks a distinct sketch — `nd` (the HLL estimate). */
  def derived(viewDf: DataFrame): DataFrame = {
    val withAvg = viewDf.withColumn("avg_val",
      col("sum_val").cast("double") / col("cnt").cast("double"))
    if (viewDf.columns.contains("nd_sketch"))
      withAvg.withColumn("nd", hll_sketch_estimate(col("nd_sketch")))
    else withAvg
  }

  /** Apply one mutation epoch's deltas to the state table.
    * `distinctCol` must match [[initialize]]'s. */
  def maintain(src: DocumentStore, table: String, fromV: Int, toV: Int,
               key: String, groupCol: String, valCol: String,
               state: DocumentStore, stateTable: String,
               distinctCol: Option[String] = None): Unit = {
    val feed = src.changeFeed(table, fromV, toV, Seq(key)).cache()
    // before-images: ONE narrow column-pruned scan of the fromV
    // snapshot, broadcast-semi-joined down to the epoch's touched keys
    val before = src.readVersion(table, fromV)
      .select(col(key), col(groupCol).as("old_g"),
        col(valCol).cast("decimal(18,2)").as("old_v"))
      .join(broadcast(feed.select(col(key))), Seq(key), "left_semi")
    val joined = feed.join(broadcast(before), Seq(key), "left")
    val zero = lit(0).cast("decimal(18,2)")
    // per-row deltas; an update that MOVES groups contributes (−1, −old)
    // to the old group and (+1, +new) to the new one
    val minus = joined.filter(col("change").isin("delete", "update"))
      .select(col("old_g").as(groupCol), lit(-1L).as("dc"),
        (zero - col("old_v")).as("dv"), col("old_v").as("rv"))
    val plusCols = Seq(col(groupCol), lit(1L).as("dc"),
      col(valCol).cast("decimal(18,2)").as("dv")) ++
      distinctCol.map(c => col(c).as("__nd"))
    val plus = joined.filter(col("change").isin("insert", "update")).select(plusCols: _*)
    val deltas = minus.drop("rv").unionByName(plus.drop(distinctCol.map(_ => "__nd").toSeq: _*))
      .groupBy(col(groupCol))
      .agg(sum(col("dc")).as("dc"), sum(col("dv")).as("dv"))
    val rem = minus.groupBy(col(groupCol))
      .agg(min(col("rv")).as("rem_min"), max(col("rv")).as("rem_max"))
    val insAggs = Seq(min(col("dv")).as("ins_min"), max(col("dv")).as("ins_max")) ++
      distinctCol.map(_ => hll_sketch_agg(col("__nd")).as("ins_sketch"))
    val ins = plus.groupBy(col(groupCol)).agg(insAggs.head, insAggs.tail: _*)
    val cur = state.read(stateTable)
      .join(broadcast(deltas.select(col(groupCol))), Seq(groupCol), "left_semi")
    val combined = cur.join(deltas, Seq(groupCol), "full_outer")
      .join(rem, Seq(groupCol), "left")
      .join(ins, Seq(groupCol), "left")
    // recount iff the group's extremum may have left — or, when a
    // sketch is tracked, on ANY removal (HLL cannot forget). Missing
    // state row with removals is recounted too (conservative).
    val sawRemoval = col("rem_min").isNotNull || col("rem_max").isNotNull
    val needRecount =
      if (distinctCol.isDefined) sawRemoval
      else sawRemoval && (col("min_val").isNull ||
        col("rem_min") <= col("min_val") || col("rem_max") >= col("max_val"))
    val incCols = Seq(col(groupCol),
      (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cnt"),
      (coalesce(col("sum_val"), zero) + coalesce(col("dv"), zero))
        .cast("decimal(18,2)").as("sum_val"),
      least(col("min_val"), col("ins_min")).as("min_val"),     // least/greatest
      greatest(col("max_val"), col("ins_max")).as("max_val")) ++ // skip nulls
      distinctCol.map(_ => when(col("nd_sketch").isNull, col("ins_sketch"))
        .when(col("ins_sketch").isNull, col("nd_sketch"))
        .otherwise(hll_union(col("nd_sketch"), col("ins_sketch"))).as("nd_sketch"))
    val incremental = combined.filter(!needRecount).select(incCols: _*)
      .filter(col("cnt") > 0)
    val recountGroups = combined.filter(needRecount).select(col(groupCol))
    val recomputed = aggregate(
      src.readVersion(table, toV)
        .join(broadcast(recountGroups), Seq(groupCol), "left_semi"),
      groupCol, valCol, distinctCol)
    val merged = incremental.unionByName(recomputed)
    // a group emptied by the epoch has no merged row -> leaves the view
    // through the KEYED anti-join delete (keys never visit the driver)
    val vanishedP = graft.operators.Pinned.checkpoint(
      cur.join(broadcast(merged.select(col(groupCol))),
        Seq(groupCol), "left_anti").select(col(groupCol)))
    try {
      state.upsert(stateTable, merged, keys = Seq(groupCol))
      if (!vanishedP.df.isEmpty)
        state.delete(stateTable, vanishedP.df, Seq(groupCol))
      // tracked release: a long-running sync otherwise pins one vanished
      // snapshot per epoch forever (Dataset.unpersist can't free it)
    } finally vanishedP.release()
    feed.unpersist()
    ()
  }
}
