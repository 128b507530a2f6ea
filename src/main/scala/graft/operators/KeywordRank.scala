package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword relevance ranking over a document corpus: TF-IDF and BM25.
  *
  * The reference retrieves by vector similarity only (MongoDbService.cs:
  * 194-227); a production retrieval engine pairs that with lexical
  * ranking (BM25) and fuses the two (see [[graft.search.HybridSearch]]).
  * Both rankers here are pure relational plans — no per-row state, no
  * UDFs in the hot path — so Catalyst handles pushdown/codegen and the
  * shapes scale:
  *
  *  - tokenization is a generate (explode) — no shuffle;
  *  - term frequencies: one shuffle on (doc, term) with map-side
  *    partial aggregation;
  *  - document frequencies / corpus stats are tiny aggregates that
  *    broadcast back into the score join (no second shuffle of the
  *    token stream);
  *  - per-term partial scores are summed through exact DECIMAL(28,12)
  *    accumulation so the result is independent of aggregation order
  *    (floating-point sums are not associative; a hash aggregate may
  *    combine in any order).
  *
  * Determinism: given the same corpus, every output column is
  * bit-reproducible across partitionings — required for the external
  * DuckDB oracle and for training-data reproducibility.
  */
object KeywordRank {

  /** Lowercased alphanumeric terms, one row per (id, term) occurrence. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("term"))

  /** (id, term, tf) — occurrence counts per document. */
  def termFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol).groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Exact decimal accumulation of a double: deterministic under any
    * aggregation order (see class doc). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(28,12)")).cast("double")

  /** The tokenized corpus aggregated once into the three tables every
    * ranking query needs — a search engine indexes once and serves many
    * queries; re-tokenizing 100 TB per query is the wrong shape. `tf`
    * and `lens` are PINNED via eager `localCheckpoint` (each feeds 2-3
    * plan branches that Catalyst's ReuseExchange cannot dedupe once
    * constraint-inferred filters specialize them). Not `cache()`: a
    * lazy cache populates DURING the first action, so two branches
    * racing through the tokenize stage can each run it, and an
    * evicted block re-tokenizes on the next query — the r12 q65
    * finding (2× under memory pressure). Checkpointed blocks
    * materialize exactly once and spill to disk instead of
    * recomputing. Blocks are freed when the index is GC'd (the
    * ContextCleaner); for a long-lived persistent index, write the
    * tables out and reload instead ([[graft.search.InvertedIndex]]). */
  final case class KeywordIndex(tf: DataFrame, lens: DataFrame, stats: DataFrame,
                                idCol: String,
                                pinned: Seq[Pinned.Df] = Seq.empty) {
    /** Frees the checkpoint blocks — via the tracked RDD ids, because
      * `Dataset.unpersist` on a localCheckpoint'd frame is a silent
      * no-op (see [[Pinned]]; the r14 leak-audit finding). */
    def close(): Unit = pinned.foreach(_.release())
  }

  /** @param persist pin the index tables (serve-path default); pass
    *                 false for a one-shot pure plan. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
                 persist: Boolean = true): KeywordIndex = {
    // spread the tokenize+explode stage: a single-file (single-row-group)
    // corpus otherwise runs it in ONE task regardless of cluster size;
    // explicit count because AQE coalesces a count-less repartition of a
    // small-bytes input back to ~1 partition
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val tf0 = termFreq(df.repartition(n, col(idCol)), idCol, textCol)
    val tfP = if (persist) Some(Pinned.checkpoint(tf0)) else None
    val tf = tfP.map(_.df).getOrElse(tf0)
    val lens0 = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("len"))
    val lensP = if (persist) Some(Pinned.checkpoint(lens0)) else None
    val lens = lensP.map(_.df).getOrElse(lens0)
    val stats = lens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("len").cast("double")).as("avg_len"))
    KeywordIndex(tf, lens, stats, idCol, tfP.toSeq ++ lensP.toSeq)
  }

  /** BM25 against a prebuilt [[KeywordIndex]] — the serve-path shape: no
    * corpus scan; one pass over the tf index filtered to the query terms
    * (the posting lists). dfreq (≤ one row per query term) and the
    * one-row stats broadcast; the posting-list⋈lens join is left
    * unhinted — AQE broadcasts the posting side when it is small and
    * falls back to a key-partitioned shuffle join when a common term
    * makes it corpus-sized (a forced broadcast would OOM there). */
  def bm25Indexed(idx: KeywordIndex, queryTerms: Seq[String],
                  k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val qterms = queryTerms.distinct
    val tfq = idx.tf.filter(col("term").isin(qterms: _*))
    val dfreq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val partial = tfq
      .join(broadcast(dfreq), "term")
      .join(idx.lens, idx.idCol)
      .crossJoin(broadcast(idx.stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part_score",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avg_len"))))
    partial.groupBy(col(idx.idCol)).agg(dsum(col("part_score")).as("score"))
  }

  /** TF-IDF scores, top `topK` terms per document.
    *
    * score = tf * ln(N / df) with N = documents bearing at least one
    * token; ranking key is the score rounded to 6dp (then term asc) so
    * rank boundaries are stable across engines.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame =
    tfidfIndexed(buildIndex(df, idCol, textCol, persist = false), topK)

  /** TF-IDF against a prebuilt [[KeywordIndex]] (see [[tfidf]]). Unlike
    * the per-query dfreq in [[bm25Indexed]], this dfreq spans the WHOLE
    * vocabulary — never force-broadcast it (10^8+ distinct terms at
    * corpus scale would OOM the driver); both sides of the term join are
    * already term-partitioned aggregates, so AQE picks the right
    * strategy. */
  def tfidfIndexed(idx: KeywordIndex, topK: Int): DataFrame = {
    val dfreq = idx.tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = idx.tf.join(dfreq, "term")
      .crossJoin(broadcast(idx.stats))
      .withColumn("tfidf", round(col("tf") *
        log(col("n_docs") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col(idx.idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(idx.idCol), col("term"), col("tfidf"), col("rnk"))
  }

  /** BM25 scores of every document containing at least one query term.
    *
    * idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    * score(d) = Σ_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len/avgLen))
    *
    * The per-term partial is pure double arithmetic (deterministic);
    * the per-document sum goes through decimal accumulation.
    * Output: (id, score) — raw double, callers round for display.
    *
    * For oracle parity keep `k1`/`b` binary-exact (multiples of 1/4 —
    * default k1=1.25, b=0.75): their decimal renderings then parse to the
    * identical doubles in any SQL dialect, whatever the literal type.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.25, b: Double = 0.75): DataFrame =
    bm25Indexed(buildIndex(df, idCol, textCol, persist = false), queryTerms, k1, b)

  /** One-shot BM25 for a KNOWN small term set — the cold-path complement
    * to [[bm25Indexed]]. Instead of materializing the full (doc, term)
    * tf index (a shuffle carrying one row per distinct term occurrence)
    * only to filter it down to the query terms, this pivots the query
    * terms into conditional aggregates so the ONLY shuffle is keyed by
    * document id and carries one short row per document:
    * (id, len, tf_term1..tf_termK). Corpus stats (n_docs, avg_len) and
    * per-term dfs come from one extra one-row aggregate over that tiny
    * cached table. At 100 TB the savings is the difference between
    * shuffling ~tokens-many rows and ~docs-many rows.
    *
    * Bit-parity with [[bm25Indexed]]: per-term partials use the identical
    * expression tree (same IEEE evaluation order) and the per-document
    * sum goes through the same exact DECIMAL(28,12) accumulation, which
    * is order-independent — so scores match the indexed path and the SQL
    * oracle bit-for-bit. Use the indexed path when terms are many or
    * unknown in advance (the pivot adds one column per query term). */
  def bm25Direct(df: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val qterms = queryTerms.distinct
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = tokens(df.repartition(n, col(idCol)), idCol, textCol)
    val tfCols = qterms.zipWithIndex.map { case (t, i) =>
      count(when(col("term") === t, 1)).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("len"), tfCols: _*)
      .cache()
    val dfCols = qterms.indices.map(i =>
      count(when(col(s"__tf_$i") > 0, 1)).as(s"__df_$i"))
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (avg(col("len").cast("double")).as("avg_len") +: dfCols): _*)
    val partials = qterms.indices.map { i =>
      val tf = col(s"__tf_$i"); val dfq = col(s"__df_$i")
      val idf = log(lit(1.0) + (col("n_docs") - dfq + lit(0.5)) / (dfq + lit(0.5)))
      val part = idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avg_len")))
      when(tf > 0, part.cast("decimal(28,12)"))
        .otherwise(lit(BigDecimal(0)).cast("decimal(28,12)"))
    }
    perDoc
      .filter(qterms.indices.map(i => col(s"__tf_$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        partials.reduce(_ + _).cast("double").as("score"))
  }

  /** The DuckDB-dialect oracle fragments mirroring the plans above —
    * kept next to the Scala so formula drift breaks visibly. `table`
    * must expose (idCol, textCol). */
  object Sql {
    def tokensCte(table: String, idCol: String, textCol: String): String =
      s"""tok AS (SELECT $idCol, unnest(regexp_extract_all(lower($textCol), '[a-z0-9]+')) AS term
         |       FROM $table)""".stripMargin

    /** Mirrors [[KeywordRank.bm25]] operation-for-operation. Every
      * arithmetic step is forced to DOUBLE (a bare `0.5` literal is
      * DECIMAL in DuckDB, and decimal math would diverge from Spark's
      * double math); expression nesting matches the Scala parse tree so
      * IEEE evaluation order is identical. */
    def bm25(table: String, idCol: String, textCol: String,
             queryTerms: Seq[String], k1: Double = 1.25, b: Double = 0.75): String = {
      require(k1 * 4 == (k1 * 4).floor && b * 4 == (b * 4).floor,
        "k1 and b must be binary-exact (multiples of 0.25) for oracle parity")
      val terms = queryTerms.distinct.map(t => s"'$t'").mkString(", ")
      s"""WITH ${tokensCte(table, idCol, textCol)},
         |tf AS (SELECT $idCol, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |lens AS (SELECT $idCol, SUM(tf) AS len FROM tf GROUP BY 1),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |                 AVG(CAST(len AS DOUBLE)) AS avg_len FROM lens),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf
         |          WHERE term IN ($terms) GROUP BY 1),
         |partial AS (
         |  SELECT tf.$idCol,
         |    ln(1.0 + (n_docs - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |      (CAST(tf AS DOUBLE) * ${k1 + 1.0}) /
         |      (tf + $k1 * (${1.0 - b} + $b * CAST(len AS DOUBLE) / avg_len)) AS part_score
         |  FROM tf
         |  JOIN dfreq USING (term)
         |  JOIN lens USING ($idCol), stats
         |  WHERE term IN ($terms))
         |SELECT $idCol,
         |  CAST(SUM(CAST(part_score AS DECIMAL(28,12))) AS DOUBLE) AS score
         |FROM partial GROUP BY $idCol""".stripMargin
    }
  }
}
