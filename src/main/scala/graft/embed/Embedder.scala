package graft.embed

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text → vector embedding stage.
  *
  * The reference calls Azure OpenAI ada-002 per document, sequentially
  * (SharedLib/Services/OpenAiService.cs:122-155; ingest loop
  * MongoDbService.cs:422-430) — the stated reason its initial load takes
  * 5-10 minutes (README.md:154). Here embedding is a batched, partition-
  * parallel Spark stage: `mapPartitions` over an [[Embedder]], so N
  * documents cost N/(partitions·batch) round-trips instead of N.
  *
  * For tests and offline runs the [[HashProjectionEmbedder]] is fully
  * deterministic (seeded feature hashing, unit-norm), so pipelines hash
  * identically across runs — required for the golden tests (SURVEY §5).
  */
trait Embedder extends Serializable {
  def dims: Int
  /** Embed a batch. Must be deterministic or idempotent: Spark task
    * retries re-invoke it (SURVEY §4, retry note). */
  def embed(batch: Seq[String]): Seq[Array[Float]]
}

/** Deterministic feature-hashing embedder: each whitespace token is
  * hashed (FNV-1a 64), the hash seeds a splitmix64 stream that assigns
  * the token ±1 contributions across `dims`; token vectors are summed
  * and L2-normalized. Same text → same unit vector, any JVM. */
final case class HashProjectionEmbedder(dims: Int = 64, seed: Long = 42L) extends Embedder {

  @inline private def splitmix64(s: Long): Long = {
    var z = s + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  def embedOne(text: String): Array[Float] = {
    val acc = new Array[Double](dims)
    if (text != null) {
      var start = 0; val len = text.length
      var i = 0
      // manual whitespace split — no intermediate String[] garbage
      while (i <= len) {
        if (i == len || Character.isWhitespace(text.charAt(i))) {
          if (i > start) {
            val tok = text.substring(start, i)
            var state = fnv1a64(tok) ^ seed
            var d = 0
            while (d < dims) {
              state = splitmix64(state)
              acc(d) += (if ((state & 1L) == 0L) 1.0 else -1.0)
              d += 1
            }
          }
          start = i + 1
        }
        i += 1
      }
    }
    var norm = 0.0; var d = 0
    while (d < dims) { norm += acc(d) * acc(d); d += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dims)
    d = 0
    while (d < dims) { out(d) = (acc(d) * inv).toFloat; d += 1 }
    out
  }

  override def embed(batch: Seq[String]): Seq[Array[Float]] = batch.map(embedOne)
}

object Embed {
  /** Append `outputCol: array<float>` by embedding `textCol`, batched per
    * partition (V1/V4). Works on any row shape; schema-preserving plus one
    * column. The row goes through an internal batch buffer so a remote
    * embedder could amortize one HTTP call per `batchSize` texts. */
  def withEmbedding(df0: DataFrame, textCol: String, outputCol: String,
                    embedder: Embedder, batchSize: Int = 256,
                    maxInputTokens: Option[Int] = None,
                    codec: graft.functions.TokenCodec = graft.functions.Tokenizer): DataFrame = {
    val df1 = if (df0.columns.contains(outputCol)) df0.drop(outputCol) else df0
    // embedding is the CPU-heaviest per-row stage in the ingest path; a
    // single-file (or single-row-group) source would otherwise pin it to
    // one task — spread first, the raw text shuffle is cheap next to the
    // embed compute (same rationale as Dedup.spread)
    val parallelism = df1.sparkSession.sparkContext.defaultParallelism
    val df = if (df1.rdd.getNumPartitions < parallelism)
      df1.repartition(parallelism) else df1
    val schema = df.schema.add(StructField(outputCol, ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    // MaxEmbeddingTokens contract (appsettings.json:17): over-long texts
    // are head-truncated in token space BEFORE the model call, so one
    // oversized document can't fail (or silently degrade) a whole batch.
    val cap: String => String = maxInputTokens match {
      case Some(n) => s => if (s == null) s else codec.truncateHead(s, n)
      case None => identity
    }
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val vecs = embedder.embed(rows.map(r => cap(r.getAs[String](idx))))
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(enc)
  }

  /** Scalar column form for literals / small columns: a deterministic UDF
    * over the hash-projection embedder (safe under task retry). */
  def embedUdf(embedder: HashProjectionEmbedder): Column => Column = {
    val det = udf((s: String) => embedder.embedOne(s))
    c => det(c)
  }
}
