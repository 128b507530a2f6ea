package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs document cosine similarity over sparse tf·idf
  * vectors — the batch "find every similar pair" primitive behind
  * templated-page collapse, near-boilerplate clustering, and
  * duplicate-query mining (Bayardo, Ma, Srikant, "Scaling Up All Pairs
  * Similarity Search", WWW 2007 — the inverted-list formulation; their
  * prefix pruning is the same df-ordered lever as the engine's Jaccard
  * PPJoin, exposed here as the `maxDf` hot-term cut).
  *
  * Where the shingle operators ([[Dedup.ngramJaccardPairs]]) measure
  * SET overlap of n-grams, this measures WEIGHTED term-vector angle —
  * rare shared terms count more, so it catches same-topic/template
  * pairs whose exact wording diverged too far for shingles.
  *
  * Exactness discipline: weights are the engine's integer tf·idf
  * (w = tf · (bits(N) − bits(df)), the q90/q159 floor-log2 idiom), so
  * dot products and norms are EXACT BIGINTs; cosine = dot/(√na·√nb)
  * touches floating point only through IEEE-exact sqrt/mul/div — both
  * engines produce identical bits, making the pair set and rounded
  * scores oracle-hash-stable.
  *
  * Scale shape: candidate pairs come from ONE posting-list self-join
  * keyed by term (Σdf² bound — identical to the Jaccard join, and
  * ReuseExchange computes the weighted posting stream once); `maxDf`
  * drops terms above the df cap from BOTH the join and the norms
  * (similarity in the reduced term space — the standard stopword-cut
  * semantics, replayed identically by the oracle). The norm table is
  * doc-cardinality and joins in twice by id. */
object AllPairs {

  /** Directed-canonical pairs (a_id < b_id) with cosine ≥ threshold:
    * (a_id, b_id, dot, cos).
    *
    * `prefixFilter = true` switches candidate generation to Bayardo's
    * prefix principle: order each document's terms by (df asc, term);
    * the PREFIX is the minimal leading set whose removal drops the
    * remaining suffix norm below τ, and by Cauchy-Schwarz a qualifying
    * pair's FIRST shared term must lie in both prefixes — so the
    * candidate join touches only prefix postings (the rarest terms),
    * and the full dot is computed exactly for candidates alone. The
    * prefix bound is exact integer/decimal arithmetic (suffix² · den² ≥
    * num² · norm with τ conservatively rationalized DOWNWARD — never
    * prunes a qualifying pair), and the output is IDENTICAL to the
    * unfiltered path (spec-asserted).
    *
    * MEASURED trade (PLANS.md, sf0.1): on the synthetic dense corpus
    * the prefix path is ~25× SLOWER than the plain join (same 443 k
    * answer) — when prefixes still hold common-ish terms the filter
    * barely prunes, and the per-candidate map-lookup verification costs
    * far more than the posting join's grouped multiply. Use it for
    * Zipfian corpora at high τ, where prefixes are genuinely rare
    * terms; for dense corpora the levers are threshold and `maxDf`. */
  def cosinePairs(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double, maxDf: Option[Long] = None,
                  prefixFilter: Boolean = false): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"bad threshold $threshold")
    if (prefixFilter)
      return cosinePairsPrefix(df, idCol, textCol, threshold, maxDf)
    // integer weight per (doc, term); hot terms are absent entirely.
    // ZERO-weight terms (bits(N) == bits(df) — the idf floor for terms in
    // at least ~half the corpus) are dropped: they contribute 0 to every
    // dot and norm, and keeping them would give an all-stopword document
    // a zero norm (0/0 cosine) instead of no pairs at all.
    val w = weighted(df, idCol, textCol, maxDf)
      .select(col("doc"), col("term"), col("w"))
    val norms = w.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nrm"))
    val dots = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.withColumnRenamed("doc", "a_id").withColumnRenamed("nrm", "na"), "a_id")
      .join(norms.withColumnRenamed("doc", "b_id").withColumnRenamed("nrm", "nb"), "b_id")
      // IEEE sqrt/mul/div on exact integers: deterministic bits. ONE
      // sqrt of the exact na·nb product (not √na·√nb) so identical
      // documents score exactly 1.0 — √n·√n ≠ n in doubles, √(n·n) = n
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("dot"), col("cos"))
  }

  /** INCREMENTAL form: each batch document against the STANDING corpus
    * — the per-ingest "is this a near-copy of anything we already
    * have?" gate (the q93 incremental-dedup shape in weighted-cosine
    * space). The corpus is never self-joined: candidate pairs come from
    * batch postings ⋈ corpus postings on term, so the pair space is
    * Σ_t df_batch(t)·df_corpus(t) — bounded by the batch, not the
    * corpus². Weights/df/N are computed over corpus ∪ batch (the state
    * the corpus would have after admission — idf can never serve staler
    * than the decision it guards). Ids must be unique across both
    * inputs; a re-ingested id never pairs with itself.
    *
    * Output: (batch_id, corpus_id, dot, cos) with cos ≥ threshold. */
  def cosineAgainstCorpus(batch: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          threshold: Double,
                          maxDf: Option[Long] = None): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"bad threshold $threshold")
    val all = batch.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
    val w = weighted(all, idCol, textCol, maxDf)
      .select(col("doc"), col("term"), col("w"))
    val norms = w.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nrm"))
    val bIds = batch.select(col(idCol).as("doc")).distinct()
    val cIds = corpus.select(col(idCol).as("doc")).distinct()
    val wb = w.join(bIds, "doc")
    val wc = w.join(cIds, "doc")
    wb.as("a").join(wc.as("b"),
        col("a.term") === col("b.term") && col("a.doc") =!= col("b.doc"))
      .groupBy(col("a.doc").as("batch_id"), col("b.doc").as("corpus_id"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
      .join(norms.withColumnRenamed("doc", "batch_id")
        .withColumnRenamed("nrm", "na"), "batch_id")
      .join(norms.withColumnRenamed("doc", "corpus_id")
        .withColumnRenamed("nrm", "nb"), "corpus_id")
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("dot"), col("cos"))
  }

  /** Admission matches for one ingest batch: every batch document's
    * qualifying near-matches against BOTH the standing corpus and the
    * EARLIER part of its own batch — the complete evidence set an
    * admission gate needs ([[graft.streaming.AdmissionIngest]]). Two
    * rulings per rejected doc are possible and both are emitted:
    *
    *  - (batch_id, matched_id ∈ corpus): a near-copy of standing data;
    *  - (batch_id, matched_id ∈ batch, matched_id < batch_id): an
    *    in-batch near-dup pair, directed larger→smaller so FIRST-WINS
    *    is deterministic — the smaller id survives unless it matches
    *    something else itself.
    *
    * Weights/df/N are computed ONCE over corpus ∪ batch and shared by
    * both match kinds — scoring in-batch pairs with batch-only
    * statistics would degenerate on small batches (a 2-doc batch of
    * identical documents gives every shared term df = N, weight 0, and
    * the duplicates sail through). Ids must be unique across both
    * inputs. Output: (batch_id, matched_id, dot, cos) with
    * cos ≥ threshold. */
  def admissionMatches(batch: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String,
                       threshold: Double,
                       maxDf: Option[Long] = None): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"bad threshold $threshold")
    val all = batch.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
    val w = weighted(all, idCol, textCol, maxDf)
      .select(col("doc"), col("term"), col("w"))
    val norms = w.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nrm"))
    val bIds = batch.select(col(idCol).as("doc")).distinct()
    val cIds = corpus.select(col(idCol).as("doc")).distinct()
    val wb = w.join(bIds, "doc")
    val wc = w.join(cIds, "doc")
    def contribs(other: DataFrame, cond: org.apache.spark.sql.Column) =
      wb.as("a").join(other.as("b"), col("a.term") === col("b.term") && cond)
        .select(col("a.doc").as("batch_id"), col("b.doc").as("matched_id"),
          (col("a.w") * col("b.w")).as("p"))
    contribs(wc, col("a.doc") =!= col("b.doc"))
      .unionByName(contribs(wb, col("a.doc") > col("b.doc")))
      .groupBy(col("batch_id"), col("matched_id"))
      .agg(sum(col("p")).as("dot"))
      .join(norms.withColumnRenamed("doc", "batch_id")
        .withColumnRenamed("nrm", "na"), "batch_id")
      .join(norms.withColumnRenamed("doc", "matched_id")
        .withColumnRenamed("nrm", "nb"), "matched_id")
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("batch_id"), col("matched_id"), col("dot"), col("cos"))
  }

  /** Weighted postings (doc, term, w, df) in the reduced positive-weight
    * space — shared by both candidate strategies. */
  private def weighted(df: DataFrame, idCol: String, textCol: String,
                       maxDf: Option[Long]): DataFrame = {
    val tf = KeywordRank.termFreq(df, idCol, textCol)
      .withColumnRenamed(idCol, "doc")
    val n = tf.select(col("doc")).distinct().count()
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val capped = maxDf match {
      case None => dfc
      case Some(cap) => dfc.filter(col("df") <= cap)
    }
    tf.join(broadcast(capped), "term")
      .withColumn("w", col("tf") * (length(bin(lit(n))) - length(bin(col("df")))))
      .filter(col("w") > 0)
      .select(col("doc"), col("term"), col("w"), col("df"))
  }

  private def cosinePairsPrefix(df: DataFrame, idCol: String, textCol: String,
                                threshold: Double,
                                maxDf: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // τ rationalized DOWNWARD (num/den ≤ τ): a looser prefix bound keeps
    // MORE terms in prefixes — never prunes a qualifying pair
    val den = 1000000L
    val num = math.floor(threshold * den).toLong
    // NOT persisted: prefix/norms/vecs all land in ONE final plan, so
    // ReuseExchange computes the weighted posting shuffle once; a cache
    // here would outlive the call (the PageRank-r9 leak pattern)
    val w = weighted(df, idCol, textCol, maxDf)
    val norms = w.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nrm"))
    // global term order (df asc, term): prefixes hold the RAREST terms,
    // so the candidate join runs over small posting lists. Position r is
    // in the prefix iff the suffix starting AT r still reaches τ:
    // (nrm − presum(<r)) · den² ≥ num² · nrm — exact DECIMAL arithmetic
    // (overflows BIGINT at den=1e6; sound exact compare either way).
    val ord = Window.partitionBy(col("doc")).orderBy(col("df"), col("term"))
    val prefix = w
      .withColumn("__pre", coalesce(sum(col("w") * col("w"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(norms, "doc")
      .filter((col("nrm") - col("__pre")).cast("decimal(20,0)") * lit(den * den) >=
        lit(num * num).cast("decimal(20,0)") * col("nrm"))
      .select(col("doc"), col("term"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .distinct()
    // exact verification for candidates only: per-doc weight maps, dot
    // via a codegen HOF over the smaller map against the other's lookups
    val vecs = w.groupBy(col("doc"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("w")))).as("m"))
    val out = cand
      .join(vecs.select(col("doc").as("a_id"), col("m").as("ma")), "a_id")
      .join(vecs.select(col("doc").as("b_id"), col("m").as("mb")), "b_id")
      .withColumn("dot", aggregate(map_entries(col("ma")), lit(0L),
        (acc, e) => acc + e.getField("value") *
          coalesce(element_at(col("mb"), e.getField("key")), lit(0L))))
      .join(norms.withColumnRenamed("doc", "a_id").withColumnRenamed("nrm", "na"), "a_id")
      .join(norms.withColumnRenamed("doc", "b_id").withColumnRenamed("nrm", "nb"), "b_id")
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("dot"), col("cos"))
    out
  }
}
