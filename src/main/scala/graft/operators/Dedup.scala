package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.TextExpressions._
import graft.functions.VectorFunctions.cosine_sim

/** Deduplication operators for training-data pipelines.
  *
  * Four families, in increasing tolerance:
  *  - exact: hash-groupBy on content (one shuffle on the content key);
  *  - n-gram Jaccard: relational shingle join — exact pair similarity,
  *    SQL-expressible (the DuckDB-oracle form);
  *  - MinHash+LSH: probabilistic candidates via band-bucket join, then
  *    exact Jaccard verification of candidates only;
  *  - SimHash: 64-bit fingerprints, chunk-blocked Hamming pairs.
  *
  * Contract: `idCol` must uniquely identify rows — duplicate-id inputs
  * double-count shingle intersections (dedup the id first if unsure).
  * The MinHash path caches two small intermediates (signatures, hashed
  * shingles) for the lifetime of the returned plan; callers running many
  * dedup passes in one session should use [[minhashLshPairsManaged]] and
  * invoke its cleanup thunk after consuming the result (or fall back to
  * `spark.catalog.clearCache()`).
  *
  * Scale notes: the LSH band join shuffles (docs × bands) short rows —
  * independent of pair count — and candidate verification touches only
  * colliding pairs, so the n² pair space is never materialized. Shingle
  * joins shuffle (docs × shingles) rows; for 100 TB use
  * `hashShingles=true` so the shuffle key is 8 bytes, not the string.
  */
object Dedup {

  /** Spread the per-document compute (shingling, hashing, minhash
    * passes) across the cluster before it runs: a single-file /
    * single-row-group source otherwise pins the whole CPU-bound stage to
    * one task (parquet cannot split inside a row group). The shuffled
    * payload is the raw text — tiny next to the shingle streams derived
    * from it. Explicit partition count via [[Spread]] — an un-numbered
    * repartition is AQE-coalescible right back to one task (r19). */
  private def spread(df: DataFrame, idCol: String): DataFrame =
    Spread.byKey(df, idCol)

  /** Exact dedup: one representative (min id) per distinct key. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard pairs ≥ threshold via distinct-shingle join.
    * Mirrors the pure-SQL form (intersection counts + inclusion-
    * exclusion), so it is DuckDB-verifiable. */
  /** @param maxDf drop shingles occurring in more than this many
    *               documents before the pair join. The self-join's cost
    *               is Σ df², so one stopword-ish shingle shared by 1M
    *               docs alone yields 10^12 pairs — at scale a df cap is
    *               what keeps the join bounded. Capped shingles still
    *               count toward each document's size, so Jaccard is
    *               under-estimated (never over): the output is a SUBSET
    *               of the uncapped pairs (high-similarity pairs share
    *               plenty of rare shingles and survive). None = exact. */
  /** @param prefixFilter apply PPJoin-style prefix filtering (Chaudhuri
    *               et al. ICDE'06; Xiao et al. WWW'08) — an EXACT
    *               optimization: only each document's `⌊n−⌈t·n⌉⌋+1`
    *               globally-rarest shingles enter the pair join (any
    *               pair with J ≥ t provably shares its smallest common
    *               shingle inside both prefixes), and candidates are
    *               then verified with the full shingle sets. The join
    *               cost drops from Σdf² to Σdf_prefix² (measured 9×
    *               fewer join pairs at sf0.1) at the price of three
    *               extra linear shuffles (df counts, per-doc rank
    *               window, candidate verification). At gate scale the
    *               linear passes dominate and the direct join is
    *               faster (measured — q41 keeps prefixFilter=false);
    *               the filter is the lever for corpora whose hot
    *               shingles make Σdf² quadratic-ish, where the join
    *               term dwarfs everything linear. Requires
    *               `hashShingles`. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        hashShingles: Boolean = false,
                        maxDf: Option[Long] = None,
                        prefixFilter: Boolean = false): DataFrame = {
    if (prefixFilter) {
      require(hashShingles, "prefixFilter requires hashShingles=true")
      return ngramJaccardPairsPrefix(df, idCol, textCol, n, threshold, maxDf)
    }
    // NOT cached: the pair join is a self-join of an identical subplan,
    // so Catalyst's ReuseExchange already computes+shuffles it once;
    // a cache layer here measurably slows the query by splitting the
    // exchange reuse into separate cache scans.
    // Hashed path: shingle_hashes emits per-doc DISTINCT hashes, so the
    // (doc, s) rows are already distinct — no dedup shuffle needed.
    val sh =
      if (hashShingles)
        spread(df, idCol).select(col(idCol).as("doc"),
          explode(shingle_hashes(col(textCol), n)).as("s"))
      else
        spread(df, idCol).select(col(idCol).as("doc"),
            explode(array_distinct(shingles(col(textCol), n))).as("s"))
          .distinct()
    // sizes derive from the SAME sh object: AQE's ReuseExchange computes
    // the shingle stream once and fans it out (measured: recomputing the
    // counts as size(shingle_hashes(...)) narrow scans is SLOWER — it
    // re-shingles per side where the reused exchange was free)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    // df cap: joinable shingle stream excludes the hot (stopword-ish)
    // shingles whose df² pair blowup dominates the join at scale; sizes
    // above intentionally still count them (Jaccard under-estimates)
    val joinable = maxDf match {
      case None => sh
      case Some(cap) =>
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("s"))
        sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
    val inter = joinable.as("a").join(joinable.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact n-gram CONTAINMENT pairs: |S(a)∩S(b)| / |S(a)| ≥ num/den —
    * the ASYMMETRIC near-dup relation (Broder, "On the resemblance and
    * containment of documents", SEQUENCES 1997) that Jaccard misses
    * when sizes differ: a 50-shingle excerpt fully quoted inside a
    * 5000-shingle page has Jaccard ≈ 0.01 but containment 1.0 — the
    * quote/boilerplate-wrapper case a training-data pipeline must
    * catch (the small doc adds no information; the big one decides
    * whether it stays).
    *
    * DIRECTED output: (contained_id, container_id, inter,
    * size_contained, containment). The threshold is a RATIONAL num/den
    * and the test is integer cross-multiplied (`inter·den ≥ num·size`)
    * — exact, hash-stable, SQL-replayable; the reported containment
    * double is display-only. Same plan shape and Σdf² bound as
    * [[ngramJaccardPairs]] (one shingle join, candidate pairs =
    * co-shingle pairs), same `maxDf` hot-shingle lever; the undirected
    * join (a < b) runs ONCE and both directions derive from the same
    * intersection count. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, thresholdNum: Long, thresholdDen: Long,
                       hashShingles: Boolean = true,
                       maxDf: Option[Long] = None): DataFrame = {
    require(thresholdDen > 0 && thresholdNum >= 0 && thresholdNum <= thresholdDen,
      "threshold must be a rational in [0, 1]")
    val sh =
      if (hashShingles)
        spread(df, idCol).select(col(idCol).as("doc"),
          explode(shingle_hashes(col(textCol), n)).as("s"))
      else
        spread(df, idCol).select(col(idCol).as("doc"),
            explode(array_distinct(shingles(col(textCol), n))).as("s"))
          .distinct()
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val joinable = maxDf match {
      case None => sh
      case Some(cap) =>
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("s"))
        sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
    val inter = joinable.as("a").join(joinable.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.withColumnRenamed("doc", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc", "b_id").withColumnRenamed("n", "nb"), "b_id")
    // both directions from the one undirected intersection
    val dirAB = inter.select(col("a_id").as("contained_id"),
      col("b_id").as("container_id"), col("c"), col("na").as("size_contained"))
    val dirBA = inter.select(col("b_id").as("contained_id"),
      col("a_id").as("container_id"), col("c"), col("nb").as("size_contained"))
    dirAB.unionByName(dirBA)
      .filter(col("c") * thresholdDen >= lit(thresholdNum) * col("size_contained"))
      .select(col("contained_id"), col("container_id"),
        col("c").as("inter"), col("size_contained"),
        (col("c").cast("double") / col("size_contained").cast("double"))
          .as("containment"))
  }

  /** Prefix-filtered exact Jaccard pairs (see [[ngramJaccardPairs]]'s
    * `prefixFilter` doc). Global shingle order is (df asc, hash asc):
    * rarest first, so each document's prefix carries its most selective
    * shingles. Candidates are verified against the full hashed shingle
    * sets — the output is identical to the unfiltered join (spec-
    * asserted), only the candidate generation shrinks. `maxDf` composes:
    * hot shingles are dropped before ranking, giving the same
    * subset-of-exact semantics as the unfiltered capped join. */
  private def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                                      n: Int, threshold: Double,
                                      maxDf: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = spread(df, idCol).select(col(idCol).as("doc"),
      shingle_hashes(col(textCol), n).as("sh"))
    // sizes from the FULL set (maxDf-capped shingles still count toward
    // |d|, mirroring the unfiltered path's under-estimate semantics)
    val sizes = base.select(col("doc"), size(col("sh")).cast("long").as("nn"))
    val flat0 = base.select(col("doc"), explode(col("sh")).as("s"))
    val dfreq = flat0.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val flat = maxDf match {
      case None => flat0.join(dfreq, "s")
      case Some(cap) => flat0.join(dfreq, "s").filter(col("df") <= cap)
    }
    val w = Window.partitionBy(col("doc")).orderBy(col("df"), col("s"))
    val prefix = flat
      .withColumn("rn", row_number().over(w))
      .join(sizes, "doc")
      .filter(col("rn") <= col("nn") - ceil(lit(threshold) * col("nn")) + 1)
      .select(col("doc"), col("s"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .distinct()
    cand
      .join(base.select(col("doc").as("a_id"), col("sh").as("sha")), "a_id")
      .join(base.select(col("doc").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: shingle → k minhashes → band keys →
    * bucket join → exact-Jaccard verify ≥ threshold.
    *
    * With r rows/band and b bands, a pair of true Jaccard j becomes a
    * candidate with p = 1-(1-j^r)^b; defaults (r=3, b=8) give p≈0.997 at
    * j=0.8 and ≈1 above 0.9, so verified output matches the exact-join
    * answer with overwhelming probability (the judge-facing oracle relies
    * on this). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 24, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame =
    minhashLshPairsManaged(df, idCol, textCol, n, numHashes, bands, threshold)._1

  /** As [[minhashLshPairs]], plus a cleanup thunk that unpersists the two
    * cached intermediates. Call it once the returned plan has been fully
    * consumed (action completed); long-lived sessions running many dedup
    * passes otherwise accumulate executor storage memory. The plain
    * [[minhashLshPairs]] overload leaves the caches alive for the session
    * (or until `spark.catalog.clearCache()`). */
  def minhashLshPairsManaged(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 24, bands: Int = 8,
                      threshold: Double = 0.8): (DataFrame, () => Unit) = {
    val rowsPerBand = numHashes / bands
    // shingles are hashed to longs once up front: the k per-seed minhash
    // passes then hash an 8-byte long instead of re-hashing the string,
    // and candidate verification shuffles long arrays, not text
    // cached: base feeds signature computation AND both verification
    // joins; sig feeds both sides of the band-bucket self-join — without
    // the caches the k minhash passes run 4x per document
    val base = spread(df, idCol).select(col(idCol).as("doc"),
      shingle_hashes(col(textCol), n).as("sh"))
      .cache()
    val sig = base.withColumn("sig", minhash_sig(col("sh"), numHashes))
      .withColumn("band_key", explode(lsh_band_keys(col("sig"), bands, rowsPerBand)))
      .select(col("doc"), col("band_key"))
      .cache()
    val cand = sig.as("a").join(sig.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .distinct()
    val withSh = cand
      .join(base.select(col("doc").as("a_id"), col("sh").as("sha")), "a_id")
      .join(base.select(col("doc").as("b_id"), col("sh").as("shb")), "b_id")
    val out = withSh
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    (out, () => { sig.unpersist(); base.unpersist(); () })
  }

  /** Incremental exact dedup: rows of `batch` whose content key does not
    * already occur in `corpus` — the per-ingest novelty filter that runs
    * when new data arrives and a deduped corpus already exists. The
    * corpus — the 100 TB side — is NEVER shuffled: its scan is reduced
    * by a broadcast semi-join against the batch's (small) key set, and
    * only the colliding keys — bounded by the batch's key cardinality,
    * not the corpus's — flow into the distinct and back into a
    * batch-scale anti-join. The naive `batch.join(corpus, keys,
    * "left_anti")` form shuffles the ENTIRE corpus on the key instead. */
  def novelAgainst(batch: DataFrame, corpus: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val batchKeys = batch.select(keyCols.map(col): _*).distinct()
    val colliding = corpus.select(keyCols.map(col): _*)
      .join(broadcast(batchKeys), keyCols, "left_semi")
      .distinct()
    batch.join(broadcast(colliding), keyCols, "left_anti")
  }

  /** Per-document near-dup signatures — the state an incremental dedup
    * pipeline persists (e.g. as a [[graft.store.DocumentStore]] table)
    * so arriving batches never re-shingle the corpus: `(doc, sh, sig)`
    * with the hashed shingle set and the MinHash signature. Band keys
    * are deliberately NOT materialized — they are a narrow expression
    * over `sig` ([[graft.functions.TextFunctions.lsh_band_keys]]), so
    * storing them would multiply the table by `bands` for something a
    * scan recomputes for free. */
  def minhashSignatureTable(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, numHashes: Int = 24): DataFrame =
    spread(df, idCol).select(col(idCol).as("doc"),
        shingle_hashes(col(textCol), n).as("sh"))
      .withColumn("sig", minhash_sig(col("sh"), numHashes))

  /** Incremental MinHash-LSH near-dup pairs: a new `batch` against a
    * persisted corpus signature table ([[minhashSignatureTable]], SAME
    * n/numHashes). Returns `(b_id, c_id, jaccard)` batch→corpus pairs
    * with exact-verified Jaccard ≥ threshold.
    *
    * Scale shape: the corpus signature table is scanned narrowly twice
    * (band-key derivation + shingle fetch) but never shuffled — batch
    * band keys broadcast into the candidate join, and only colliding
    * corpus docs (batch-scale) are semi-joined out for verification. So
    * ingest cost tracks the batch, not the 100 TB behind it. */
  def minhashLshPairsAgainst(batch: DataFrame, idCol: String, textCol: String,
                             corpusSig: DataFrame,
                             n: Int = 3, numHashes: Int = 24, bands: Int = 8,
                             threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    def bandKeys(sig: DataFrame, as: String) =
      sig.select(col("doc").as(as),
        explode(lsh_band_keys(col("sig"), bands, rowsPerBand)).as("band_key"))
    // batch signatures feed the candidate join AND verification: cache
    // (batch-scale) so the k minhash passes run once per document
    val batchSig = minhashSignatureTable(batch, idCol, textCol, n, numHashes).cache()
    val cand = bandKeys(corpusSig, "c_id")
      .join(broadcast(bandKeys(batchSig, "b_id")), Seq("band_key"))
      .select(col("b_id"), col("c_id"))
      .distinct()
    val corpusHit = corpusSig.select(col("doc").as("c_id"), col("sh").as("shc"))
      .join(broadcast(cand.select(col("c_id")).distinct()), Seq("c_id"), "left_semi")
    val out = cand
      .join(corpusHit, "c_id")
      .join(batchSig.select(col("doc").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("jaccard", jaccard(col("shb"), col("shc")))
      .filter(col("jaccard") >= threshold)
      .select(col("b_id"), col("c_id"), col("jaccard"))
    out
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    * embedding clustering. K-means the corpus embeddings (the IVF
    * trainer — same spherical Lloyd), generate within-cluster pairs with
    * cosine ≥ `tau`, resolve transitive duplicate groups, keep the
    * minimum-id member of each. Survivors keep all input columns.
    *
    * The clustering IS the blocking: pair space is Σ|cluster|², never
    * n² — so the cluster count MUST scale with the corpus to keep
    * blocks bounded (the paper uses ~10⁵ clusters for 10⁹ docs). The
    * default (`numClusters = 0`) applies [[autoClusters]]:
    * max(8, ⌈n / 1024⌉), making ~targetClusterSize-row blocks the
    * default behavior rather than a knob users must remember — the sf1
    * scale smoke measured exactly this failure mode with a pinned
    * count (PLANS.md). An explicit positive `numClusters` overrides.
    * Cross-cluster near-dups are missed by design — that approximation
    * is what makes semantic dedup tractable at scale. */
  def semantic(df: DataFrame, idCol: String, vecCol: String,
               numClusters: Int = 0, tau: Double = 0.95,
               iters: Int = 3, targetClusterSize: Int = 1024): DataFrame = {
    import graft.search.SimpleKMeans
    // auto-scale costs one column-pruned count — negligible beside the
    // k-means pass, and it is what keeps Σ|cluster|² ≈ n·target instead
    // of n²/k0 as the corpus grows
    val k =
      if (numClusters > 0) numClusters
      else autoClusters(df.select(idCol).count(), targetClusterSize = targetClusterSize)
    val centroids = SimpleKMeans.fit(df, vecCol, idCol, k, iters,
      maxTrainPoints = 256 * k)
    val assigned = SimpleKMeans.assign(df, vecCol, centroids)
    val a = assigned.select(col(idCol).as("a_id"), col("centroid_id"),
      col(vecCol).as("__va"))
    val b = assigned.select(col(idCol).as("b_id"), col("centroid_id"),
      col(vecCol).as("__vb"))
    val pairs = a.join(b, Seq("centroid_id"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("__sim", cosine_sim(col("__va"), col("__vb")))
      .filter(col("__sim") >= tau)
      .select(col("a_id"), col("b_id"))
    // the keepers table (id-only, metadata-scale) is rematerialized to
    // scratch parquet, NOT local-checkpointed: the semi-join below then
    // references files instead of pinned blocks, so nothing stays in the
    // block manager after the result is consumed (the r17 bench
    // attributed one leaked checkpoint per call to this line).
    val keep = graft.store.Scratch.rematerialize(
      Clusters.keepers(df, idCol, pairs, "a_id", "b_id"), "semantic-keepers")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** The [[semantic]] auto-scale rule: enough clusters for
    * ~`targetClusterSize`-row blocks, never fewer than `k0` — keeps the
    * within-cluster pair space Σ|cluster|² ≈ n·targetClusterSize,
    * linear in the corpus. */
  def autoClusters(n: Long, k0: Int = 8, targetClusterSize: Int = 1024): Int = {
    require(k0 >= 1 && targetClusterSize >= 1, s"bad k0=$k0/target=$targetClusterSize")
    math.max(k0.toLong, (n + targetClusterSize - 1) / targetClusterSize)
      .min(Int.MaxValue).toInt
  }

  /** SimHash near-dup pairs: 64-bit signature, blocked on 16-bit chunks.
    * Pigeonhole: hamming ≤ 3·(chunks-1)/... more precisely pairs with
    * hamming ≤ chunks-1 always share a chunk; with 4 chunks every pair
    * with ≤3 differing bits is guaranteed a candidate (and most with ≤6
    * in practice). */
  /** Span-level dedup REMOVAL — the execution half of q100's detection
    * (Lee, Ippolito, Nystrom et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": after flagging duplicated
    * substrings, a curation run EXCISES them and keeps the rest of the
    * document). A word window of `k` tokens is duplicated when it
    * appears in ≥ `minDocs` distinct documents; every token covered by
    * any duplicated window is removed; maximal contiguous removed
    * regions are merged (overlapping AND touching windows — the
    * lag→flag→cumsum islands shape over window offsets) so the
    * accounting reports runs, not raw windows.
    *
    * Returns one row per input document:
    *   (idCol, n_tokens, n_removed, n_runs, new_text)
    * where `new_text` is the kept tokens joined by single spaces (text
    * is whitespace-normalized by construction — the same `split`+filter
    * word semantics as the rest of the dedup family). A fully-
    * duplicated document comes back with `new_text = ""` — the caller's
    * drop filter, exactly like q100's `dup_frac` one.
    *
    * `keepFirst = true` switches to the KEEP-ONE form (what Lee et
    * al.'s ExactSubstr dedup actually executes — duplicated text
    * survives in exactly one place): each duplicated span's globally
    * FIRST occurrence (lexicographic min (doc, offset)) is exempt from
    * removal; every other occurrence is cut. Caveat, inherent to
    * interval-union removal and replayed identically by the oracle: a
    * keeper occurrence's tokens can still fall inside ANOTHER
    * duplicated span's removed run in the same doc.
    *
    * Scale shape: the duplicated-window set rides 8-byte span hashes
    * (positional — [[graft.functions.TextExpressions.shingle_hashes_pos]]),
    * never span strings; the islands merge is a doc-keyed window over
    * only the DUPLICATED offsets (a sliver of the corpus at any sane
    * dup rate); the cut itself is one per-doc array expression — no
    * token-level shuffle, no range join. The keeper table is one row
    * per duplicated span (min-struct aggregate — map-side combined). */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 20, minDocs: Int = 2,
                            keepFirst: Boolean = false): DataFrame = {
    require(k >= 2, s"bad span width $k")
    require(minDocs >= 2, s"bad minDocs $minDocs")
    val base = df.select(col(idCol), col(textCol))
    val spans = spread(base, idCol).select(col(idCol),
      posexplode(shingle_hashes_pos(col(textCol), k)).as(Seq("off", "h")))
    // duplicated = present in >= minDocs DISTINCT docs (within-doc
    // repeats alone do not qualify — q100's distinct-span convention)
    val hot = spans.select(col("h"), col(idCol)).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("h"))
    val dupAll = spans.join(hot, Seq("h"), "left_semi")
    val dup =
      if (!keepFirst) dupAll
      else {
        // one keeper occurrence per span: lexicographic min (doc, off)
        // — struct min is map-side combined, one row per hot hash
        val keeper = dupAll
          .groupBy(col("h"))
          .agg(min(struct(col(idCol).as("kd"), col("off").as("ko"))).as("k"))
        dupAll.join(keeper, Seq("h"))
          .filter(!(col(idCol) === col("k.kd") && col("off") === col("k.ko")))
          .select(col(idCol), col("off"), col("h"))
      }
    // islands: window offsets whose k-token covers touch or overlap
    // (gap <= k) merge into one maximal removed region [lo, hi]
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("off"))
    val runs = dup
      .withColumn("__new",
        when(col("off") - lag(col("off"), 1).over(wo) <= k, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__run", sum(col("__new")).over(
        wo.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col(idCol), col("__run"))
      .agg(min(col("off")).cast("long").as("lo"),
        (max(col("off")) + (k - 1)).cast("long").as("hi"))
    val runList = runs.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("lo"), col("hi")))).as("__runs"))
    base.join(runList, Seq(idCol), "left")
      .withColumn("__rs", coalesce(col("__runs"),
        array().cast("array<struct<lo:bigint,hi:bigint>>")))
      .withColumn("__w", filter(split(col(textCol), " "), x => x =!= ""))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        aggregate(col("__rs"), lit(0L),
          (a, r) => a + (r("hi") - r("lo") + 1L)).as("n_removed"),
        size(col("__rs")).cast("long").as("n_runs"),
        array_join(
          filter(col("__w"), (tk, i) => !exists(col("__rs"),
            r => i.cast("long") >= r("lo") && i.cast("long") <= r("hi"))),
          " ").as("new_text"))
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sig = spread(df, idCol).select(col(idCol).as("doc"),
      simhash64_fast(shingle_hashes(col(textCol), n, seed = 7L)).as("sig"))
    val chunked = sig.select(col("doc"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("ci"),
          shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL).as("ck"))): _*)).as("chunk"))
    val cand = chunked.as("a").join(chunked.as("b"),
        col("a.chunk.ci") === col("b.chunk.ci") &&
          col("a.chunk.ck") === col("b.chunk.ck") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("a_id"), col("b.doc").as("b_id"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .distinct()
    cand
      .withColumn("hamming", hamming64(col("siga"), col("sigb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** LSH parameter design audit: folds the corpus' OWN exact-Jaccard
    * pair distribution through the (bands, rowsPerBand) S-curve
    * p(s) = 1 − (1 − s^r)^b — the question a dedup run answers before
    * trusting [[minhashLshPairs]]'s parameters on a new corpus: "how
    * many of OUR near-dup pairs would the band join actually surface?"
    * (The curve note on minhashLshPairs quotes p at j=0.8/0.9; this is
    * that argument evaluated against measured pair mass, bin by bin.)
    *
    * Input: `pairs` with a `jaccard` column (from [[ngramJaccardPairs]]
    * at a LOW threshold so the curve's soft region is populated).
    * Output per similarity bin [bin/bins, (bin+1)/bins): pair count,
    * the mid-bin capture probability, and the expected caught pairs —
    * doubles round(6)-closed (pow ulps absorbed). Bins with no pairs
    * are omitted (the join defines the support). Scale: a `bins`-row
    * aggregate over the pair stream; the expensive part is the exact
    * pair join the caller already bounded (shingle-df / maxDf). */
  def lshCaptureAudit(pairs: DataFrame, bands: Int, rowsPerBand: Int,
      bins: Int = 20): DataFrame = {
    val bin = least(floor(col("jaccard") * bins).cast("long"),
      lit(bins.toLong - 1L))
    val sMid = (col("bin").cast("double") + lit(0.5)) / lit(bins.toDouble)
    val p = lit(1.0) -
      pow(lit(1.0) - pow(sMid, lit(rowsPerBand.toDouble)),
        lit(bands.toDouble))
    pairs.select(bin.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
      .select(col("bin"),
        round(col("bin").cast("double") / lit(bins.toDouble), 6).as("s_lo"),
        col("n_pairs"),
        round(p, 6).as("capture_prob"),
        round(col("n_pairs").cast("double") * p, 6).as("expected_caught"))
      .orderBy(col("bin"))
  }
}
