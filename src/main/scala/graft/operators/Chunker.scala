package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words

/** Document chunking for RAG ingestion: split long documents into
  * overlapping word windows before embedding (the reference embeds
  * whole documents because its corpus is small — ChatService vectorizes
  * per-document; at 100 TB the unit of retrieval must be the chunk).
  *
  * Pure per-row narrow transforms (split → sequence → slice → explode):
  * no shuffle at all, fully codegen-friendly, scales linearly with
  * input bytes. Chunk count per doc is ceil((len-size)/stride)+1 with a
  * minimum of one (short and empty docs yield a single chunk).
  */
object Chunker {

  /** One row per (doc × chunk): `idCol`, `chunk_id`, `chunk_text`,
    * `n_words`. Windows are `size` words advancing by `stride`
    * (stride < size ⇒ overlapping context, the usual RAG setting). */
  def slidingWordChunks(df: DataFrame, idCol: String, textCol: String,
                        size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive: $size/$stride")
    // null text behaves like empty text (one empty chunk) — without the
    // coalesce a null doc's chunk count is null and the row silently
    // vanishes at the explode, inconsistently with "" (one empty chunk)
    val withWords = df.select(col(idCol), words(coalesce(col(textCol), lit(""))).as("__w"))
      .withColumn("__len", org.apache.spark.sql.functions.size(col("__w")).cast("long"))
    val nChunks = (lit(1L) +
      floor((greatest(col("__len") - size, lit(0L)) + (stride - 1)) / lit(stride))).cast("long")
    withWords
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("__slice",
        slice(col("__w"), (col("chunk_id") * stride + 1).cast("int"), lit(size)))
      .select(col(idCol), col("chunk_id"),
        array_join(col("__slice"), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(col("__slice")).cast("long").as("n_words"))
  }
}
