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

  /** Packing efficiency summary: sequences, their fill (last sequence is
    * the only ragged one by construction — fill = tokens/seqLen). */
  def packingStats(packed: DataFrame, seqLen: Long): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(sum(col("n_tokens")).as("tokens"), count(lit(1)).as("n_slices"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("tokens")).as("total_tokens"),
        avg(col("tokens") / lit(seqLen.toDouble)).as("mean_fill"))
}
