package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words

/** Sequence packing for LLM training: documents ordered by id form one
  * global token stream, split into fixed-length training sequences
  * ("concat-then-chunk" — the GPT-style pretraining layout, where a
  * document may span sequence boundaries).
  *
  * The global running offset is the scale problem: a naive
  * `Window.orderBy(id)` funnels the whole corpus through ONE partition.
  * Instead: range-partition by id, per-partition running sums (each
  * window is `partitionBy(pid)` — parallel), then add per-partition
  * base offsets computed from the partition totals (a driver-side
  * cumulative sum over numPartitions longs — driver-scale by design).
  *
  * Token counts use whitespace words by default so the layout is
  * engine-reproducible (SQL-oracle-exact); pass any deterministic
  * `tokensPerDoc` column for BPE-true packing.
  */
object Packing {

  /** One row per (sequence × document slice): `seq_id`, the doc id,
    * `begin_in_seq` (token offset of the slice within the sequence) and
    * `n_tokens` of the slice. Zero-token documents pack nowhere and are
    * dropped (they contribute no training tokens).
    *
    * @param seqLen   fixed sequence length in tokens (e.g. 2048/4096/8192)
    * @param numParts range partitions for the offset pass; defaults to
    *                 the session's shuffle parallelism
    */
  def concatChunk(df: DataFrame, idCol: String, textCol: String, seqLen: Long,
                  numParts: Int = 0): DataFrame =
    concatChunkBy(df, idCol, size(words(col(textCol))).cast("long"), seqLen, numParts)

  /** As [[concatChunk]] with an explicit deterministic token-count
    * expression (e.g. a BPE token count column). */
  def concatChunkBy(df: DataFrame, idCol: String, tokensExpr: org.apache.spark.sql.Column,
                    seqLen: Long, numParts: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val wc = df.select(col(idCol).cast("long").as("id"), tokensExpr.as("n"))
      .filter(col("n") > 0)
      .repartitionByRange(parts, col("id"))
      .withColumn("pid", spark_partition_id())
    // per-partition running sums: every window group is one partition's
    // rows — parallel across pids, never a single global sort.
    // Rematerialized to scratch parquet: the totals collect below and the
    // final emit must read the SAME materialization — without it the
    // range shuffle + window run twice, and the base offsets would
    // silently depend on two executions of the range sampler agreeing on
    // partition boundaries. The staged rows are (id, n, pid, cum) — four
    // longs per document, metadata-scale next to the corpus — and scratch
    // (unlike a local checkpoint) pins no blocks in the returned plan.
    val local = graft.store.Scratch.rematerialize(
      wc.withColumn("local_cum",
        sum(col("n")).over(Window.partitionBy(col("pid")).orderBy(col("id")))),
      "packing-offsets")
    // partition totals -> exclusive base offsets (numPartitions rows)
    val totals = local.groupBy(col("pid")).agg(max(col("local_cum")).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix sum of partition totals = per-pid base offset
    // (range partitions are ordered by id, so pid order IS id order).
    // Shipped back as a broadcast join, NOT a per-pid when-chain: with
    // thousands of partitions the case expression would blow up codegen.
    val bases = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val basesDf = spark.createDataFrame(bases.toSeq).toDF("pid", "base")
    val placed = local.join(broadcast(basesDf), "pid")
      .withColumn("start", col("local_cum") - col("n") + col("base"))
    // explode each doc over the sequences its token span overlaps
    placed
      .withColumn("seq_id",
        explode(sequence(floor(col("start") / seqLen),
          floor((col("start") + col("n") - 1) / seqLen))))
      .select(
        col("seq_id"),
        col("id"),
        greatest(col("start") - col("seq_id") * seqLen, lit(0L)).as("begin_in_seq"),
        (least(col("start") + col("n"), (col("seq_id") + 1) * seqLen)
          - greatest(col("start"), col("seq_id") * seqLen)).as("n_tokens"))
      .withColumnRenamed("id", idCol)
  }

  /** NO-SPLIT document bin packing — the SFT layout, where a document
    * must stay intact inside one training sequence (cross-doc
    * attention contamination is the thing being avoided, so
    * [[concatChunk]]'s span-the-boundary behavior is exactly wrong).
    * Next-fit-decreasing within deterministic shards:
    *
    *  1. shard by `id mod shards` (corpus-wide sort is the scale
    *     killer; shard-local packing bounds the waste increase — each
    *     shard wastes at most one partial bin more than a global pack,
    *     and shards pack in parallel);
    *  2. within a shard, documents sort (tokens desc, id) and a single
    *     streaming fold assigns bins: fits-in-current → same bin, else
    *     open the next. O(n) per shard, one comparison per document —
    *     no quadratic first-fit bin scan, and the decreasing order
    *     gives NFD its classic near-FFD packing quality;
    *  3. documents longer than `seqLen` cannot pack without splitting
    *     and come back with bin = -1 (the caller truncates or routes
    *     them to [[concatChunk]]).
    *
    * Everything is exact integer state, so the fold replays in SQL as
    * a recursive CTE advancing every shard's rank-r document per step
    * (the q432 oracle) — a wrong sort order, shard hash, overflow
    * rule, or fill transition breaks the hash.
    *
    * Output: (idCol, n_tokens, shard, bin) with bin LOCAL to the shard
    * (global sequence id = shard * maxBinsPerShard + bin if needed).
    * Zero-token docs are dropped (they contribute nothing). */
  def binPackDocs(df: DataFrame, idCol: String,
      tokensExpr: org.apache.spark.sql.Column, seqLen: Long,
      shards: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    import spark.implicits._
    val nShards = if (shards > 0) shards
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val docs = df
      .select(col(idCol).cast("long").as("doc"), tokensExpr.cast("long").as("tok"))
      .filter(col("tok") > 0)
      .withColumn("shard", pmod(col("doc"), lit(nShards.toLong)))
    docs
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("tok").desc, col("doc"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // hash partitioning may co-locate several shards in one task;
        // rows arrive shard-contiguous (leading sort key), so the fold
        // resets at each shard boundary. Sentinel (bin=-1, fill=cap)
        // makes the first packable doc open bin 0 via the normal rule.
        var shard = Long.MinValue
        var bin = -1L
        var fill = 0L
        it.map { case (doc, tok, sh) =>
          if (sh != shard) { shard = sh; bin = -1L; fill = seqLen }
          if (tok > seqLen) (doc, tok, sh, -1L)
          else if (fill + tok <= seqLen) { fill += tok; (doc, tok, sh, bin) }
          else { bin += 1L; fill = tok; (doc, tok, sh, bin) }
        }
      }
      .toDF(idCol, "n_tokens", "shard", "bin")
  }

  /** Packing efficiency summary: sequences, their fill (last sequence is
    * the only ragged one by construction — fill = tokens/seqLen). */
  def packingStats(packed: DataFrame, seqLen: Long): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(sum(col("n_tokens")).as("tokens"), count(lit(1)).as("n_slices"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("tokens")).as("total_tokens"),
        avg(col("tokens") / lit(seqLen.toDouble)).as("mean_fill"))
}
