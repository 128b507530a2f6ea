package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for link-prediction training data —
  * the "label 0" half every edge-ranking model needs (recommender
  * training on the supply/click/citation graph): for each left node,
  * `k` pseudo-random partners drawn from the right-node pool that are
  * NOT observed edges.
  *
  * The at-scale construction avoids both classic traps:
  *  - drawing partners by GLOBAL INDEX needs a dense node numbering —
  *    a corpus-scale rank window (the q86 one-partition funnel);
  *  - rejection-resampling until k survivors needs data-dependent
  *    iteration.
  *  Instead the right pool hashes into `buckets` buckets, each bucket
  *  elects a REPRESENTATIVE (min node id — one bounded aggregate,
  *  broadcastable), and candidate j for left node a is the
  *  representative of bucket Knuth(a·31 + j, seed) — a narrow
  *  expression + one broadcast join. Observed edges then anti-join
  *  away; self-collisions among the k draws dedup. The result is UP TO
  *  k negatives per left node (the dropped ones are real edges or
  *  duplicate draws — reported by the caller comparing counts, never
  *  silently resampled: resampling would make the draw count
  *  data-dependent and the output partitioning-sensitive).
  *
  *  The bucket-representative pool is a bounded sub-sample of the
  *  right nodes (size ≤ `buckets`) — the standard uniform-negative
  *  approximation, with the pool deterministic and seed-rotatable.
  *  All arithmetic is the engine's replayable Knuth stack.
  *
  *  Two hash-discipline lessons are load-bearing here (spec-pinned):
  *  the bucket comes from the key's HIGH bits (`key div 2³²⁄B` —
  *  Fibonacci hashing), because the low bits of a multiplicative hash
  *  depend only on the low bits of the input, so a `mod B` bucket
  *  ignores every seed bit ≥ log₂B; and the seed perturbs ONLY the
  *  left draws — seeding both sides with the same XOR is a bucket
  *  RELABELING that cancels in the join and never changes the
  *  pairing (the q92 additive-seed lesson, join form). */
object NegativeSampling {

  private val KnuthC = 2654435761L
  private val TwoTo31 = 2147483648L
  private val TwoTo32 = 4294967296L

  private def key(c: org.apache.spark.sql.Column, seed: Long) = {
    val mixed = pmod(c.cast("long"), lit(TwoTo31))
      .bitwiseXOR(lit(((seed % TwoTo31) + TwoTo31) % TwoTo31))
    pmod(mixed * KnuthC, lit(TwoTo32))
  }

  /** (left, right, label) — the observed pairs as label 1 plus up to
    * `k` sampled non-pairs per left node as label 0. `buckets` must be
    * a power of two (the high-bits bucket is an exact integer divide
    * then). */
  def labeledPairs(edges: DataFrame, leftCol: String, rightCol: String,
                   k: Int, buckets: Int = 1024, seed: Long = 0L): DataFrame = {
    require(k >= 1 && k <= buckets, s"need 1 <= k <= buckets, got k=$k buckets=$buckets")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    // high-bits bucket = key >> (32 − log₂ buckets): an exact integer
    // shift (keys are < 2³², non-negative)
    val down = 32 - Integer.numberOfTrailingZeros(buckets)
    val pos = edges.select(col(leftCol).cast("long").as("left"),
      col(rightCol).cast("long").as("right")).distinct()
    // bucket representatives of the right pool (UNSEEDED): one bounded
    // aggregate
    val reps = pos.select(col("right"))
      .distinct()
      .groupBy(shiftright(key(col("right"), 0L), down).as("__bkt"))
      .agg(min(col("right")).as("right"))
    val cand = pos.select(col("left")).distinct()
      .select(col("left"), explode(sequence(lit(0), lit(k - 1))).as("__j"))
      .withColumn("__bkt",
        shiftright(key(col("left") * 31 + col("__j"), seed), down))
      .join(broadcast(reps), "__bkt")
      .select(col("left"), col("right"))
      .distinct() // two draws may land in the same bucket
    val neg = cand.join(pos, Seq("left", "right"), "left_anti")
    pos.select(col("left"), col("right"), lit(1).as("label"))
      .unionByName(neg.select(col("left"), col("right"), lit(0).as("label")))
  }
}
