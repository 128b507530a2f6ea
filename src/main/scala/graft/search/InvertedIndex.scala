package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Splits

/** Persisted inverted index: the keyword-retrieval counterpart of the
  * vector stores (IvfStore/HnswStore) — build once over the corpus,
  * serve term queries reading only the term's partitions.
  *
  * The reference delegates keyword search entirely to Cosmos `$search`
  * (reference Search/CognitiveSearch*); the engine owns it: postings are
  * a parquet table partitioned by a stable TERM BUCKET, so a query for k
  * terms prunes the scan to ≤ k buckets of ~1/B of the index — the
  * partition-manifest discipline every store in this engine uses. At 100
  * TB the build is one wordcount-shaped shuffle (map-side combined),
  * and serving cost tracks the queried terms' posting lists, never the
  * corpus.
  *
  * Scoring is exact-integer TF·IDF: idf weight = bits(N) − bits(df)
  * (floor-log2 via binary-string length — the q90 rarity idiom), score =
  * Σ tf·w over the query terms, so the ranking is bit-reproducible and
  * SQL-replayable. AND semantics: a hit must contain every query term.
  */
object InvertedIndex {

  /** Tokenize = the engine's standard whitespace atomization (empty
    * tokens dropped); callers normalize upstream if needed. */
  private def terms(textCol: String) =
    filter(split(col(textCol), " "), t => t =!= "")

  /** Build postings + term stats under `dir`:
    *   postings/  (term, doc_id, tf) partitioned by bucket
    *   terms/     (term, df, w)      partitioned by bucket
    *   meta/      (buckets, n_docs)  one row
    * `w` bakes in the corpus size at build time; `meta` pins the bucket
    * count so serve-side routing can never disagree with the layout. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            buckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val n = docs.count()
    import spark.implicits._
    Seq((buckets, n)).toDF("buckets", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // repartition BY BUCKET before the partitioned write: each bucket
    // lands as one coherent file run instead of every write task
    // spraying a sliver into every bucket directory (tasks × buckets
    // small files — the classic partitionBy mistake at scale)
    val postings = docs
      .select(col(idCol).as("doc_id"), explode(terms(textCol)).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", Splits.hashBucket(Splits.stringKey(col("term")), buckets))
      .repartition(col("bucket"))
      .persist()
    postings.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings")
    postings
      .groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumn("w", length(bin(lit(n))) - length(bin(col("df"))))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/terms")
    postings.unpersist(blocking = false)
  }

  /** Driver-side replica of Splits.stringKey ∘ hashBucket for a query
    * term — computes which partitions to read without touching data. */
  def bucketOf(term: String, buckets: Int = 64): Int = {
    val key = term.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    ((key % 2147483648L) * 2654435761L % 4294967296L % buckets).toInt
  }

  /** Conjunctive (all-terms) top-k: read only the query terms' buckets
    * (bucket count comes from the index's own meta — the routing can
    * never drift from the layout), join the tiny term-stats side
    * broadcast, aggregate per doc. */
  def search(spark: SparkSession, dir: String, queryTerms: Seq[String],
             k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one term")
    val buckets = spark.read.parquet(s"$dir/meta")
      .select(col("buckets")).head().getInt(0)
    val distinctTerms = queryTerms.distinct
    val bs = distinctTerms.map(bucketOf(_, buckets)).distinct
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(bs.map(Integer.valueOf): _*) &&
        col("term").isin(distinctTerms: _*))
    val stats = spark.read.parquet(s"$dir/terms")
      .filter(col("bucket").isin(bs.map(Integer.valueOf): _*) &&
        col("term").isin(distinctTerms: _*))
      .select(col("term"), col("w"))
    post.join(broadcast(stats), "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"),
        count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === distinctTerms.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
