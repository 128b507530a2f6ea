package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.TextFunctions._
import graft.operators.{Clusters, Decontaminate, Dedup, Packing, QualityFilters, Splits}

/** Training-data pipeline operators: dedup (exact / n-gram Jaccard /
  * MinHash-LSH / SimHash), language ID, quality scoring, token stats,
  * fingerprinting — all over the `documents` table.
  *
  * Oracle notes: Jaccard pair queries verify against exact SQL joins
  * (LSH's verified output equals the exact answer with p≈1 at the
  * thresholds used — see Dedup.minhashLshPairs). SimHash is seeded-hash-
  * dependent, hence rows-only + ScalaTest containment checks.
  */
object TextQueries extends QuerySet {

  private val bpePattern = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Exact dedup by full text (hash groupBy, one shuffle). */
  private def q40(s: SparkSession, d: String): DataFrame =
    Dedup.exact(t(s, d, "documents"), "doc_id", Seq("text"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  private val q40Sql =
    """SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin

  /** Exact word-3-gram Jaccard near-dup pairs (relational shingle join). */
  private def q41(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.8,
        hashShingles = true)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** Shared CTE chain computing exact word-3-gram Jaccard pairs ≥ the
    * given threshold (used by q41/q42's oracle and, transitively, by
    * q85's connected-components oracle). */
  private def pairCtes(threshold: String) =
    s"""w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |           FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
       |       FROM w WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT a_id, b_id, c * 1.0 / (sa.n + sb.n - c) AS jac
       |          FROM inter
       |          JOIN sizes sa ON sa.doc_id = a_id
       |          JOIN sizes sb ON sb.doc_id = b_id
       |          WHERE c * 1.0 / (sa.n + sb.n - c) >= $threshold)""".stripMargin

  private def jaccardSql(threshold: String) =
    s"""WITH ${pairCtes(threshold)}
       |SELECT a_id, b_id, round(jac, 6) AS jaccard
       |FROM pairs ORDER BY a_id, b_id""".stripMargin

  /** MinHash+LSH near-dup pairs, exact-verified (oracle: the exact join —
    * see probability note on Dedup.minhashLshPairs). */
  private def q42(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, numHashes = 24, bands = 8, threshold = 0.85)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** SimHash near-dup discovery made driver-checkable (q94 planted-dup
    * pattern): exact copies of docs 0-24 are planted under shifted ids —
    * identical text means identical simhash, so each planted pair MUST
    * surface at Hamming 0 (a 0-distance pair shares every 16-bit chunk,
    * so the blocked join cannot miss it). The in-query gate zeroes the
    * output unless all 25 planted pairs were discovered by the real
    * pipeline (signature → chunk block join → Hamming filter); the
    * emitted rows are the identical-text pair slice, which DuckDB
    * recomputes with a text self-join — no hash needed. Organic
    * near-dup pairs at Hamming 1-3 stay covered by DedupSpec's
    * containment-in-exact-Jaccard assertion. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") < 25)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val corpus = docs.union(planted)
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", n = 3, maxHamming = 3)
    val plantedFound = pairs.filter(
      col("b_id") === col("a_id") + 1000000L &&
        col("a_id") < 25 && col("hamming") === 0).count()
    val gated = if (plantedFound == 25L) pairs else pairs.limit(0)
    val texts = corpus
    gated
      .join(texts.select(col("doc_id").as("a_id"), col("text").as("__ta")), Seq("a_id"))
      .join(texts.select(col("doc_id").as("b_id"), col("text").as("__tb")), Seq("b_id"))
      .filter(col("__ta") === col("__tb"))
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q43Sql =
    """WITH c AS (SELECT doc_id, text FROM documents
      |           UNION ALL
      |           SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(0 AS INT) AS hamming
      |FROM c a JOIN c b ON a.text = b.text AND a.doc_id < b.doc_id
      |ORDER BY a_id, b_id""".stripMargin

  /** Language ID by stopword score, argmax with alphabetical tie-break. */
  private def q44(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  private val q44Sql = {
    def sl(lang: String) =
      StopwordLists.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    val langs = StopwordLists.map(_._1) // already alphabetical
    val scores = langs.map(l => s"len(list_intersect(w, ${sl(l)})) AS s_$l").mkString(",\n  ")
    val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString("\n  ")
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
       |           FROM documents),
       |sc AS (SELECT doc_id,
       |  $scores
       |FROM w)
       |SELECT doc_id, CASE WHEN $g = 0 THEN 'und'
       |  $cases
       |  END AS lang_pred
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Quality features: word count, mean word length, alnum ratio,
    * stopword hits. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val feats = qualityFeatures(col("text"))
    t(s, d, "documents")
      .select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        round(col("alnum_ratio"), 6).as("alnum_ratio"), col("stopword_hits"))
      .orderBy(col("doc_id"))
  }

  private val q45Sql = {
    val en = StopwordLists.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH f AS (SELECT doc_id,
       |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
       |  length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS n_alnum,
       |  length(text) AS n_chars,
       |  len(list_intersect(list_filter(string_split(lower(text), ' '), x -> x <> ''), $en)) AS stopword_hits
       |FROM documents)
       |SELECT doc_id, n_words,
       |  round(CASE WHEN n_words = 0 THEN 0.0 ELSE n_alnum * 1.0 / n_words END, 6) AS mean_word_len,
       |  round(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_alnum * 1.0 / n_chars END, 6) AS alnum_ratio,
       |  stopword_hits
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace words + BPE-ish regex lexer count. */
  private def q46(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        size(words(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("bpe_tokens"))
      .orderBy(col("doc_id"))

  private val q46Sql =
    s"""SELECT doc_id,
       |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
       |  len(regexp_extract_all(text, '$bpePattern')) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling polynomial document fingerprint (exact integer fold). */
  private def q47(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val q47Sql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus stats rollup by source over derived text features. */
  private def q48(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("source"), size(words(col("text"))).as("nw"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("sum_words"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))

  private val q48Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS sum_words,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Pivot: doc counts per source × language (wide-format reshape; the
    * oracle states it as conditional aggregation, which is also exactly
    * the plan Spark compiles a pivot to). */
  private def q49(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(col("source"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("source"))

  private val q49Sql =
    """SELECT source,
      |  COUNT(*) FILTER (WHERE lang = 'de') AS de,
      |  COUNT(*) FILTER (WHERE lang = 'en') AS en,
      |  COUNT(*) FILTER (WHERE lang = 'es') AS es,
      |  COUNT(*) FILTER (WHERE lang = 'fr') AS fr,
      |  COUNT(*) FILTER (WHERE lang = 'zh') AS zh
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic hash train/val/test split — reproducible across
    * engines/partitionings (vs randomSplit), hence SQL-oracle-exact. */
  private def q51(s: SparkSession, d: String): DataFrame =
    Splits.withSplit(t(s, d, "documents"), "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"))

  private val q51Sql =
    """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM (SELECT n_chars,
      |        (doc_id % 2147483648) * 2654435761 % 4294967296 % 100 AS b
      |      FROM documents)
      |GROUP BY 1 ORDER BY split""".stripMargin

  /** Deterministic stratified sampling: rebalance the corpus by language
    * (downsample dominant en, keep most of the rest) with the stable id
    * hash — same rows selected on any partitioning or engine. */
  private def q69(s: SparkSession, d: String): DataFrame =
    Splits.stratifiedSample(t(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.25, "zh" -> 0.4), defaultFraction = 0.6)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private val q69Sql =
    """SELECT doc_id, lang FROM documents
      |WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 % 10000 <
      |  CASE WHEN lang = 'en' THEN 2500 WHEN lang = 'zh' THEN 4000 ELSE 6000 END
      |ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: the deterministic test split is the
    * "benchmark"; training docs sharing any word-3-gram with it are
    * flagged with their shared-shingle count (n-gram overlap
    * decontamination — the GPT-3/Llama pre-training hygiene step). */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val sp = Splits.withSplit(t(s, d, "documents"), "doc_id")
    Decontaminate.sharedNgrams(
        sp.filter(col("split") === "train"),
        sp.filter(col("split") === "test"),
        "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  private val q83Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |           FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |       FROM w WHERE len(w) >= 3),
      |b AS (SELECT doc_id, (doc_id % 2147483648) * 2654435761 % 4294967296 % 100 AS b
      |      FROM documents),
      |tr AS (SELECT sh.doc_id, s FROM sh JOIN b USING (doc_id) WHERE b.b < 80),
      |te AS (SELECT DISTINCT s FROM sh JOIN b USING (doc_id) WHERE b.b >= 90)
      |SELECT tr.doc_id, COUNT(*) AS shared_ngrams
      |FROM tr JOIN te USING (s)
      |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition quality signals: duplicate-word fraction
    * and top-bigram coverage per document. */
  private def q84(s: SparkSession, d: String): DataFrame =
    QualityFilters.repetitionSignals(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"),
        round(col("dup_word_frac"), 6).as("dup_word_frac"),
        round(col("top_bigram_frac"), 6).as("top_bigram_frac"))
      .orderBy(col("doc_id"))

  private val q84Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |           FROM documents),
      |ws AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct FROM w),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS s
      |       FROM w WHERE len(w) >= 2),
      |bc AS (SELECT doc_id, s, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bs AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM bc GROUP BY 1)
      |SELECT ws.doc_id,
      |  round(CASE WHEN n_words = 0 THEN 0.0
      |    ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_words END, 6) AS dup_word_frac,
      |  round(coalesce(CAST(top_c AS DOUBLE) / n_bg, 0.0), 6) AS top_bigram_frac
      |FROM ws LEFT JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Dedup CLUSTER resolution: near-dup pairs (the q41 set) → transitive
    * connected components via alternating large-star/small-star — the
    * step between pair generation and "keep one per cluster". Oracle:
    * transitive closure by recursive CTE, min reachable id per node. */
  private def q85(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.8, hashShingles = true)
    Clusters.connectedComponents(docs, "doc_id", pairs, "a_id", "b_id")
      .orderBy(col("doc_id"))
  }

  private val q85Sql =
    s"""WITH RECURSIVE ${pairCtes("0.8")},
       |e AS (SELECT a_id AS u, b_id AS v FROM pairs
       |      UNION ALL SELECT b_id, a_id FROM pairs),
       |r(u, v) AS (SELECT doc_id, doc_id FROM documents
       |            UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u)
       |SELECT u AS doc_id, MIN(v) AS cluster_id
       |FROM r GROUP BY u ORDER BY doc_id""".stripMargin

  /** Dedup cluster REPRESENTATIVE selection — the keep-policy step after
    * q85's resolution: production dedup keeps the best member of each
    * near-dup cluster (here: most tokens, ties to the lower id — a total
    * order, so the choice is deterministic in both engines), not the
    * arbitrary min-id. Composition of existing ops: CC labels ⋈ token
    * counts → one groupBy with an argmax over a composite key; the
    * representative step adds a single doc-cardinality aggregation on
    * top of the audited q85 plan. */
  private def q109(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.8, hashShingles = true)
    val clusters = Clusters.connectedComponents(docs, "doc_id", pairs, "a_id", "b_id")
    val wc = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
    clusters.join(wc, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"), struct(col("n_tokens"), (-col("doc_id")).as("nid"))).as("rep_id"),
        count(lit(1)).as("size"),
        max(col("n_tokens")).as("rep_tokens"))
      .orderBy(col("cluster_id"))
  }

  private val q109Sql =
    s"""WITH RECURSIVE ${pairCtes("0.8")},
       |e AS (SELECT a_id AS u, b_id AS v FROM pairs
       |      UNION ALL SELECT b_id, a_id FROM pairs),
       |r(u, v) AS (SELECT doc_id, doc_id FROM documents
       |            UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
       |cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM r GROUP BY u),
       |wc AS (SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |rk AS (SELECT cluster_id, doc_id, n_tokens,
       |         ROW_NUMBER() OVER (PARTITION BY cluster_id
       |           ORDER BY n_tokens DESC, doc_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY cluster_id) AS size
       |       FROM cl JOIN wc USING (doc_id))
       |SELECT cluster_id, doc_id AS rep_id, CAST(size AS BIGINT) AS size,
       |  n_tokens AS rep_tokens
       |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** Sequence packing (concat-then-chunk, seqLen=512): distributed
    * two-phase global offset vs the oracle's single window cumsum —
    * identical layout row-for-row. */
  private def q86(s: SparkSession, d: String): DataFrame =
    Packing.concatChunk(t(s, d, "documents"), "doc_id", "text", seqLen = 512L)
      .orderBy(col("seq_id"), col("doc_id"))

  private val q86Sql =
    """WITH wc AS (SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
      |  FROM documents),
      |s AS (SELECT doc_id, n,
      |        CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS start
      |      FROM wc WHERE n > 0),
      |x AS (SELECT doc_id, n, start,
      |        unnest(range(start // 512, (start + n - 1) // 512 + 1)) AS seq_id
      |      FROM s)
      |SELECT seq_id, doc_id,
      |  GREATEST(start - seq_id * 512, 0) AS begin_in_seq,
      |  LEAST(start + n, (seq_id + 1) * 512) - GREATEST(start, seq_id * 512) AS n_tokens
      |FROM x ORDER BY seq_id, doc_id""".stripMargin

  /** PII redaction over deterministic synthetic PII (the testdata corpus
    * carries none, so both engines derive the same email/IP/phone-bearing
    * text from customer columns, then redact + count). */
  private def q87(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PiiFunctions._
    val raw = concat(
      col("c_name"), lit(" <user"), col("c_custkey"), lit("@example.com> ip 10.0."),
      col("c_nationkey"), lit("."), col("c_custkey") % 200, lit(" tel 555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    val counts = piiCounts(raw).map { case (n, c) => c.cast("long").as(n) }
    t(s, d, "customer")
      .select(col("c_custkey") +: redactPii(raw).as("redacted") +: counts: _*)
      .orderBy(col("c_custkey"))
  }

  private val q87Sql = {
    import graft.functions.PiiFunctions._
    s"""WITH raw AS (SELECT c_custkey,
       |  c_name || ' <user' || c_custkey || '@example.com> ip 10.0.' || c_nationkey
       |    || '.' || (c_custkey % 200) || ' tel 555-'
       |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM customer),
       |steps AS (SELECT c_custkey, t,
       |    regexp_replace(t, '$EmailRe', '<EMAIL>', 'g') AS t1,
       |    regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g') AS t2
       |  FROM raw)
       |SELECT c_custkey,
       |  regexp_replace(t2, '$PhoneRe', '<PHONE>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones
       |FROM steps ORDER BY c_custkey""".stripMargin
  }

  /** Sliding word-window chunking for RAG ingestion (size=40, stride=30:
    * 10-word overlap), verified chunk-for-chunk against list slicing. */
  private def q88(s: SparkSession, d: String): DataFrame =
    graft.operators.Chunker.slidingWordChunks(
        t(s, d, "documents"), "doc_id", "text", size = 40, stride = 30)
      .orderBy(col("doc_id"), col("chunk_id"))

  private val q88Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |           FROM documents),
      |n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS len,
      |        1 + (GREATEST(CAST(len(w) AS BIGINT) - 40, 0) + 29) // 30 AS nc
      |      FROM w),
      |x AS (SELECT doc_id, w, unnest(range(0, nc)) AS chunk_id FROM n)
      |SELECT doc_id, chunk_id,
      |  array_to_string(w[(chunk_id * 30 + 1):(chunk_id * 30 + 40)], ' ') AS chunk_text,
      |  CAST(len(w[(chunk_id * 30 + 1):(chunk_id * 30 + 40)]) AS BIGINT) AS n_words
      |FROM x ORDER BY doc_id, chunk_id""".stripMargin

  /** Unigram rarity quality score (CCNet-style perplexity proxy) with
    * integer-exact floor(log2) bucketing via binary-string length — the
    * whole score is oracle-exact; only the final mean divides. */
  private def q90(s: SparkSession, d: String): DataFrame =
    QualityFilters.unigramRarity(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q90Sql =
    """WITH occ AS (SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |cf AS (SELECT w, COUNT(*) AS cf FROM occ GROUP BY w),
      |tot AS (SELECT length(bin(COUNT(*))) AS tb FROM occ),
      |sc AS (SELECT doc_id, CAST(tb - length(bin(cf)) AS BIGINT) AS r
      |       FROM occ JOIN cf USING (w) CROSS JOIN tot),
      |agg AS (SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(r) AS BIGINT) AS rarity_sum
      |        FROM sc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words,
      |  CAST(COALESCE(rarity_sum, 0) AS BIGINT) AS rarity_sum,
      |  COALESCE(round(CAST(rarity_sum AS DOUBLE) / n_words, 6), 0.0) AS mean_rarity
      |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Reproducible global shuffle for training order: seeded stable-hash
    * sort, engine-reproducible (distributed range-partition sort). */
  private def q92(s: SparkSession, d: String): DataFrame =
    Splits.deterministicShuffle(
      t(s, d, "documents").select(col("doc_id"), col("lang")), "doc_id", seed = 7L)

  private val q92Sql =
    """SELECT doc_id, lang,
      |  (xor(doc_id % 2147483648, 7) * 2654435761) % 4294967296 AS shuffle_key
      |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin

  /** Incremental near-dedup: a "new batch" (doc_id ≡ 0 mod 10) against
    * the persisted MinHash signature table of the standing corpus (the
    * other 90%). The corpus side is never shuffled — batch band keys
    * broadcast into the candidate join ([[Dedup.minhashLshPairsAgainst]]),
    * so ingest cost tracks the batch. Oracle: exact word-3-gram Jaccard
    * pairs crossing the split (LSH candidate recall ≈1 at 0.85 — the
    * same probability argument as q42). */
  private def q93(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val sig = Dedup.minhashSignatureTable(corpus, "doc_id", "text", 3, 24)
    Dedup.minhashLshPairsAgainst(batch, "doc_id", "text", sig,
        n = 3, numHashes = 24, bands = 8, threshold = 0.85)
      .select(col("b_id"), col("c_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("b_id"), col("c_id"))
  }

  private val q93Sql =
    s"""WITH ${pairCtes("0.85")}
       |SELECT CASE WHEN a_id % 10 = 0 THEN a_id ELSE b_id END AS b_id,
       |       CASE WHEN a_id % 10 = 0 THEN b_id ELSE a_id END AS c_id,
       |       round(jac, 6) AS jaccard
       |FROM pairs WHERE (a_id % 10 = 0) <> (b_id % 10 = 0)
       |ORDER BY b_id, c_id""".stripMargin

  /** Bigram-LM surprisal scoring (the KenLM-style quality signal, made
    * oracle-exact): P(w2|w1) estimated as c(w1,w2)/c(w1,·) over the
    * corpus itself, per-token surprisal bucketed to floor(log2(c1/c2))+1
    * via binary-string length — integer arithmetic end to end (the q90
    * trick), so the score is bit-identical across engines; only the
    * final mean divides. A real trained LM plugs into the same dataflow
    * (counts table → join → per-doc sum). */
  private def q96(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val words = split(col("text"), " ")
    val w = docs.select(col("doc_id"),
      filter(words, x => x =!= "").as("w"))
    val bg = w.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
                 slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val scored = bg
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col("doc_id"),
        length(bin((col("c1") / col("c2")).cast("long"))).cast("long").as("r"))
    val agg = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"), sum(col("r")).as("surprisal_sum"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_sum"), lit(0L)).as("surprisal_sum"),
        coalesce(round(col("surprisal_sum").cast("double") / col("n_bigrams"), 6),
          lit(0.0)).as("mean_surprisal"))
      .orderBy(col("doc_id"))
  }

  private val q96Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |           FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(len(w) - 1),
      |           i -> {'w1': w[i+1], 'w2': w[i+2]})) AS b
      |       FROM w WHERE len(w) >= 2),
      |p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM p GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |sc AS (SELECT doc_id, CAST(length(bin(c1 // c2)) AS BIGINT) AS r
      |       FROM p JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(r) AS BIGINT) AS surprisal_sum
      |        FROM sc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(COALESCE(surprisal_sum, 0) AS BIGINT) AS surprisal_sum,
      |  COALESCE(round(CAST(surprisal_sum AS DOUBLE) / n_bigrams, 6), 0.0) AS mean_surprisal
      |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Domain-mix sampling for training-data curation: per-source quotas
    * from log₂-bucketed counts (an integer-exact "temperature" that
    * flattens domain imbalance the way T>1 sampling does, without any
    * float in the quota math), filled deterministically by the q92
    * shuffle key so the draw is reproducible and oracle-checkable.
    * Executes through [[graft.operators.DomainMix.sampled]]: a
    * hash-threshold pre-filter bounds the rank window to ~4·quota
    * survivors per source (never the corpus), with a checked bit-exact
    * fallback — the oracle below is the direct full-window form, so the
    * driver verifies the sampled plan against the naive one. */
  private def q97(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
    val total = lit(200L)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w", length(bin(col("n"))).cast("long"))
    val sumW = counts.agg(sum(col("w"))).head().getLong(0)
    val quotas = counts.withColumn("quota", (total * col("w")).cast("long") / lit(sumW))
      .select(col("source"), col("quota").cast("long").as("quota"), col("n"))
    val key = pmod((col("doc_id") % lit(2147483648L)).bitwiseXOR(lit(7L)) * lit(2654435761L),
      lit(4294967296L))
    graft.operators.DomainMix.sampled(docs, quotas, key)
      .select(col("source"), col("doc_id"), col("rn").cast("long").as("rn"))
      .orderBy(col("source"), col("rn"))
  }

  private val q97Sql =
    """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      |w AS (SELECT source, CAST(length(bin(n)) AS BIGINT) AS w FROM c),
      |q AS (SELECT source, (200 * w) // (SELECT SUM(w) FROM w) AS quota FROM w),
      |r AS (SELECT source, doc_id,
      |        ROW_NUMBER() OVER (PARTITION BY source
      |          ORDER BY (xor(doc_id % 2147483648, 7) * 2654435761) % 4294967296, doc_id) AS rn
      |      FROM documents)
      |SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
      |FROM r JOIN q USING (source)
      |WHERE rn <= quota ORDER BY source, rn""".stripMargin

  /** Leakage-safe group split: all documents of one source land in one
    * split (sklearn GroupShuffleSplit semantics) — row-level hashing
    * leaks correlated near-duplicates across train/val. The group key
    * is the engine-reproducible polynomial string hash, so the oracle
    * replays bucket assignment exactly; the per-(source, split) roll-up
    * makes the one-split-per-source invariant directly visible in the
    * compared rows. */
  private def q110(s: SparkSession, d: String): DataFrame =
    graft.operators.Splits.withGroupSplit(
        t(s, d, "documents").select(col("doc_id"), col("source")), "source")
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))

  private val q110Sql =
    """WITH k AS (SELECT source,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(source, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS key
      |  FROM documents),
      |b AS (SELECT source,
      |    (((key % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket FROM k),
      |s AS (SELECT source,
      |    CASE WHEN bucket < 80 THEN 'train'
      |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM b)
      |SELECT source, split, COUNT(*) AS n_docs
      |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin

  /** Token-budget domain mix — the training-mix primitive stated in
    * TOKENS rather than document counts ("30B web + 5B code"): each
    * source contributes its minimal deterministic-hash-order document
    * prefix whose token total reaches the source's budget. Executes
    * through [[graft.operators.DomainMix.tokenBudget]]: a
    * hash-threshold pre-filter sized by token mass bounds the
    * cumulative-sum window to ~4·budget survivor tokens per source
    * (never the corpus), with the same checked bit-exact fallback as
    * q97 — the oracle is the direct full-window form, so the driver
    * verifies the bounded plan against the naive one. */
  private def q106(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
    val budgets = docs.groupBy("source").agg(sum(col("n_tokens")).as("total_tokens"))
      .withColumn("budget_tokens", (col("total_tokens") / lit(8)).cast("long") + 100L)
    val key = pmod((col("doc_id") % lit(2147483648L)).bitwiseXOR(lit(7L)) * lit(2654435761L),
      lit(4294967296L))
    graft.operators.DomainMix.tokenBudget(docs, budgets, key, "n_tokens")
      .select(col("source"), col("doc_id"), col("n_tokens"))
      .orderBy(col("source"), col("doc_id"))
  }

  private val q106Sql =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |t AS (SELECT source, SUM(n_tokens) AS total FROM d GROUP BY source),
      |b AS (SELECT source, total // 8 + 100 AS budget FROM t),
      |r AS (SELECT source, doc_id, n_tokens,
      |        COALESCE(SUM(n_tokens) OVER (PARTITION BY source
      |          ORDER BY (xor(doc_id % 2147483648, 7) * 2654435761) % 4294967296, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |      FROM d)
      |SELECT source, doc_id, n_tokens FROM r JOIN b USING (source)
      |WHERE cum_before < budget ORDER BY source, doc_id""".stripMargin

  /** End-to-end curation pipeline — the capstone composition: quality
    * filter → exact dedup (keep min-id copy) → leakage-safe group split
    * → per-(source, split) corpus accounting, all ONE Spark DAG built
    * from the engine's own operators. What it proves is that the
    * operators COMPOSE: every stage is narrow or single-shuffle, the
    * split assignment rides the dedup survivors without a second scan,
    * and the oracle replays the whole chain relationally — a semantic
    * change to ANY stage breaks the hash. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
    // stage 1: quality floor (Gopher-style min length)
    val filtered = docs.filter(col("n_tokens") >= 20)
    // stage 2: exact dedup — survivors are the min-id copy per text
    val keepers = graft.operators.Dedup.exact(filtered, "doc_id", Seq("text"))
      .select(col("keeper_id").as("doc_id"))
    val deduped = filtered.join(keepers, "doc_id")
    // stage 3: leakage-safe split (whole sources stay together)
    val assigned = graft.operators.Splits.withGroupSplit(deduped, "source")
    // stage 4: corpus accounting per (source, split)
    assigned.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("source"), col("split"))
  }

  private val q122Sql =
    """WITH d AS (SELECT doc_id, source, text,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |f AS (SELECT * FROM d WHERE n_tokens >= 20),
      |k AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text),
      |dd AS (SELECT f.* FROM f JOIN k USING (doc_id)),
      |h AS (SELECT *,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(source, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS key
      |  FROM dd),
      |sp AS (SELECT source, n_tokens,
      |    CASE WHEN (((key % 2147483648) * 2654435761) % 4294967296) % 100 < 80
      |           THEN 'train'
      |         WHEN (((key % 2147483648) * 2654435761) % 4294967296) % 100 < 90
      |           THEN 'val' ELSE 'test' END AS split
      |  FROM h)
      |SELECT source, split, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      |FROM sp GROUP BY source, split ORDER BY source, split""".stripMargin

  /** Cross-document duplicated-span statistics — the substring-level
    * dedup signal (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", at span granularity): every 20-word
    * window hashed, a span present in ≥2 documents is duplicated text.
    * Per doc: distinct spans, duplicated spans, duplicated fraction —
    * the removal decision is then a filter on `dup_frac`. The engine
    * joins 8-byte span hashes (the scale path: the df shuffle carries
    * longs, not 120-char strings); the oracle recomputes with string
    * spans — identical counts absent a 64-bit collision (the same
    * equivalence q41 rides). */
  private def q100(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val spans = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.shingle_hashes(col("text"), 20)).as("h"))
    val hot = spans.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val tot = spans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    val dup = spans.join(hot, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    docs.select(col("doc_id"))
      .join(tot, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_spans"),
        coalesce(round(col("n_dup").cast("double") / col("n_spans"), 6), lit(0.0))
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  private val q100Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |           FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(len(w) - 19),
      |           i -> array_to_string(w[(i+1):(i+20)], ' '))) AS s
      |       FROM w WHERE len(w) >= 20),
      |df AS (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s),
      |tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY doc_id),
      |dup AS (SELECT doc_id, COUNT(*) AS n_dup
      |        FROM sh JOIN df USING (s) WHERE nd >= 2 GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_spans,
      |  COALESCE(round(CAST(n_dup AS DOUBLE) / n_spans, 6), 0.0) AS dup_frac
      |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN dup USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Mixture resampling — the data-mixing step that turns corpus
    * proportions into training proportions, with oversampling expressed
    * as real row repetition the way a training loader consumes it:
    * floor(w) copies per row plus a deterministic fractional top-up on
    * the 0-9999 id-hash grid. Fixed literal weights here so the
    * distributed repetition machinery rides a hash oracle;
    * [[graft.operators.Splits.temperatureWeights]] (the driver-side
    * weight derivation) is spec-covered. */
  private def q101(s: SparkSession, d: String): DataFrame =
    Splits.resampleByWeight(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        weights = Map("en" -> 0.25, "de" -> 1.5, "zh" -> 2.0),
        defaultWeight = 1.0)
      .select(col("doc_id"), col("lang"), col("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))

  private val q101Sql =
    """WITH x AS (SELECT doc_id, lang,
      |  (doc_id % 2147483648) * 2654435761 % 4294967296 % 10000 AS b FROM documents),
      |r AS (SELECT doc_id, lang,
      |  CASE WHEN lang = 'en' THEN 0 WHEN lang = 'de' THEN 1
      |       WHEN lang = 'zh' THEN 2 ELSE 1 END
      |  + CASE WHEN b < CASE WHEN lang = 'en' THEN 2500 WHEN lang = 'de' THEN 5000
      |                       WHEN lang = 'zh' THEN 0 ELSE 0 END
      |         THEN 1 ELSE 0 END AS reps
      |  FROM x)
      |SELECT doc_id, lang, CAST(unnest(range(reps)) AS BIGINT) AS copy_id
      |FROM r WHERE reps > 0 ORDER BY doc_id, copy_id""".stripMargin

  /** Exact top-20 corpus words via sketch-then-verify heavy hitters
    * ([[graft.operators.Frequency.heavyHitters]]) — no vocabulary-sized
    * shuffle: a bounded per-task frequent-items summary nominates
    * candidates (no false negatives above the support), exact counting
    * touches candidate rows only. Oracle: the full groupBy top-20. */
  private def q102(s: SparkSession, d: String): DataFrame = {
    val tokens = t(s, d, "documents")
      .select(explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
    graft.operators.Frequency.heavyHitters(tokens, "w", k = 20, support = 0.01)
  }

  private val q102Sql =
    """WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |           FROM documents)
      |SELECT w, COUNT(*) AS cnt FROM w GROUP BY w
      |ORDER BY cnt DESC, w LIMIT 20""".stripMargin

  /** Deterministic per-group bottom-k sample
    * ([[graft.operators.Splits.bottomKSample]]): exactly 25 uniform docs
    * per source, chosen by seeded stable-hash order — the mergeable
    * distributed reservoir (bottom-k of a union is the bottom-k of
    * merged bottom-ks), replayed exactly by the oracle's integer hash. */
  private def q157(s: SparkSession, d: String): DataFrame =
    Splits.bottomKSample(t(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", k = 25, seed = 11L)
      .select(col("doc_id"), col("source"), col("sample_key"),
        col("sample_rank").cast("long").as("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))

  private val q157Sql =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    (xor(doc_id % 2147483648, 11) * 2654435761) % 4294967296 AS sample_key
      |  FROM documents),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS sample_rank
      |  FROM h)
      |SELECT doc_id, source, sample_key, sample_rank FROM r
      |WHERE sample_rank <= 25 ORDER BY source, sample_rank""".stripMargin

  /** Persisted inverted index build + conjunctive keyword serve
    * ([[graft.search.InvertedIndex]]): postings partitioned by term
    * bucket, exact-integer TF·IDF (bits(N)−bits(df) weights — the rare
    * query term dominates, the stopword-common ones contribute tf·0),
    * AND semantics, top-10. The full persisted lifecycle runs inside
    * the timing, like the vector store gates. */
  private def q159(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-q159").toString
    graft.search.InvertedIndex.build(t(s, d, "documents"), "doc_id", "text", dir)
    graft.search.InvertedIndex.search(s, dir, Seq("dup", "vector", "merge"), k = 10)
  }

  private val q159Sql =
    """WITH occ AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM documents),
      |n AS (SELECT COUNT(*) AS nd FROM documents),
      |tfq AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM occ
      |  WHERE term IN ('dup', 'vector', 'merge') GROUP BY 1, 2),
      |dfq AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM occ
      |  WHERE term IN ('dup', 'vector', 'merge') GROUP BY 1),
      |w AS (SELECT term, CAST(length(bin(nd)) - length(bin(df)) AS INTEGER) AS w
      |      FROM dfq CROSS JOIN n),
      |sc AS (
      |  SELECT doc_id, CAST(SUM(tf * w) AS BIGINT) AS score
      |  FROM tfq JOIN w USING (term) GROUP BY doc_id
      |  HAVING COUNT(DISTINCT term) = 3)
      |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** BUILD half of the q159 lifecycle, benched separately so a build-side
    * cost (forward docmap, maintained corpus stats, term clustering)
    * can never hide a serve-side regression — or vice versa (the r10
    * lesson: one timing blended a build cost with a serve improvement).
    * Output verifies the PERSISTED artifacts: per-bucket posting
    * aggregates read back from the index, with the bucket routing
    * replayed relationally by the oracle (stringKey → Knuth → mod B);
    * the in-query gate cross-checks the maintained meta stats against a
    * recompute from the persisted docmap. */
  private def q159b(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-q159b").toString
    graft.search.InvertedIndex.build(t(s, d, "documents"), "doc_id", "text", dir)
    val store = new graft.store.DocumentStore(s, dir)
    val meta = store.read("meta").head() // (buckets, n_docs, n_tokened, total_len, tok)
    val fromMap = store.read("docmap").agg(
      count(when(col("len") > 0, 1)).as("nt"),
      coalesce(sum(col("len")), lit(0L)).as("tl")).head()
    val statsOk = meta.getLong(1) == t(s, d, "documents").count() &&
      meta.getLong(2) == fromMap.getLong(0) && meta.getLong(3) == fromMap.getLong(1)
    store.read("postings")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"),
        sum(col("tf")).as("sum_tf"))
      .filter(lit(statsOk))
      .orderBy(col("bucket"))
  }

  private val q159bSql =
    """WITH occ AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
      |b AS (
      |  SELECT term, doc_id, tf,
      |    CAST(((list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(term, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1000000007) % 2147483648)
      |     * 2654435761) % 4294967296 % 64 AS INTEGER) AS bucket
      |  FROM tf)
      |SELECT bucket, COUNT(*) AS n_postings,
      |  COUNT(DISTINCT term) AS n_terms, CAST(SUM(tf) AS BIGINT) AS sum_tf
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** SERVE half of the q159 lifecycle: the index is built ONCE per
    * (process, sf) outside the timed query — bench passes after the
    * first time only the pruned-bucket read + rank (and the pass median
    * rejects the one build-carrying pass), giving serve its own
    * round-over-round trend. Results are identical to
    * q159_inverted_index, so the same oracle gates them. */
  private val q159IdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def q159s(s: SparkSession, d: String): DataFrame = {
    val dir = q159IdxCache.computeIfAbsent(d, _ => {
      val dd = java.nio.file.Files.createTempDirectory("graft-q159-idx").toString
      graft.search.InvertedIndex.build(t(s, d, "documents"), "doc_id", "text", dd)
      dd
    })
    graft.search.InvertedIndex.search(s, dir, Seq("dup", "vector", "merge"), k = 10)
  }

  /** Incremental inverted-index maintenance from the store change feed —
    * the reference's AddRemoveData near-real-time contract
    * (AddRemoveData.cs:64-105, README.md:182-194) applied to keyword
    * search, the q139 pattern: the source-of-truth corpus mutates
    * (delete + edit + insert epochs), [[graft.store.DocumentStore.changeFeed]]
    * emits exactly the touched keys, and
    * [[graft.search.InvertedIndex.remove]]/[[graft.search.InvertedIndex.add]]
    * rewrite only the touched term buckets (COW — untouched buckets are
    * carried by manifest reference). In-query gate: postings, docmap AND
    * meta must hash-equal a FULL REBUILD over the mutated corpus
    * (both-ways exceptAll), so a stale posting or drifted corpus stat
    * zeroes the output even when it isn't in the top-k. The ranked query
    * asks for a term that exists only post-sync ("graftnewterm"), so
    * adds are proven searchable; the oracle replays the mutations
    * relationally and re-derives the exact-integer tf·idf ranking. */
  private def q161(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.Files
    import graft.search.InvertedIndex
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val src = new graft.store.DocumentStore(s,
      Files.createTempDirectory("graft-q161-src").toString)
    src.create("docs", docs)                                          // v1
    val dir = Files.createTempDirectory("graft-q161-idx").toString
    InvertedIndex.build(docs, "doc_id", "text", dir)
    src.delete("docs", col("doc_id") % 17 === 3)                      // v2
    val changed = docs.filter(col("doc_id") % 13 === 1)
      .withColumn("text", concat(col("text"), lit(" graftnewterm")))
    val inserted = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("graftnewterm table "), col("text")).as("text"))
    src.upsert("docs", changed.unionByName(inserted), keys = Seq("doc_id")) // v3
    val feed = src.changeFeed("docs", 1, 3, Seq("doc_id")).cache()
    InvertedIndex.remove(s, dir,
      feed.filter(col("change") === "delete").select("doc_id")
        .collect().map(_.getLong(0)).toSeq)
    InvertedIndex.add(s, dir,
      feed.filter(col("change").isin("insert", "update"))
        .select(col("doc_id"), col("text")), "doc_id", "text")
    feed.unpersist(blocking = false)
    val dir2 = Files.createTempDirectory("graft-q161-rebuild").toString
    InvertedIndex.build(src.read("docs"), "doc_id", "text", dir2)
    val sA = new graft.store.DocumentStore(s, dir)
    val sB = new graft.store.DocumentStore(s, dir2)
    val synced = Seq("postings", "docmap", "meta").forall { tb =>
      val a = sA.read(tb); val b = sB.read(tb)
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    }
    val res = InvertedIndex.search(s, dir, Seq("graftnewterm", "table"), k = 10)
    if (synced) res else res.limit(0)
  }

  private val q161Sql =
    """WITH v3 AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE NOT (doc_id % 17 = 3) AND NOT (doc_id % 13 = 1)
      |  UNION ALL
      |  SELECT doc_id, text || ' graftnewterm' AS text FROM documents
      |  WHERE doc_id % 13 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, 'graftnewterm table ' || text AS text
      |  FROM documents WHERE doc_id < 20),
      |occ AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM v3),
      |n AS (SELECT COUNT(*) AS nd FROM v3),
      |tfq AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM occ
      |  WHERE term IN ('graftnewterm', 'table') GROUP BY 1, 2),
      |dfq AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM occ
      |  WHERE term IN ('graftnewterm', 'table') GROUP BY 1),
      |w AS (SELECT term, CAST(length(bin(nd)) - length(bin(df)) AS INTEGER) AS w
      |      FROM dfq CROSS JOIN n),
      |sc AS (
      |  SELECT doc_id, CAST(SUM(tf * w) AS BIGINT) AS score
      |  FROM tfq JOIN w USING (term) GROUP BY doc_id
      |  HAVING COUNT(DISTINCT term) = 2)
      |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** PMI bigram collocations ([[graft.operators.Collocations]]): two
    * narrow tokenize passes + vocab-bounded aggregates; the lift score
    * is a pinned IEEE double expression both engines evaluate
    * bit-identically (no transcendentals). Ordering ties broken on
    * (w1, w2) after 6-decimal rounding so the top-25 cut is stable. */
  private def q164(s: SparkSession, d: String): DataFrame =
    graft.operators.Collocations.pmiBigrams(t(s, d, "documents"), "text", minCount = 5)
      .select(col("w1"), col("w2"), col("n12"), round(col("lift"), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(25)

  private val q164Sql =
    """WITH w AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
      |uni AS (SELECT unnest(w) AS t FROM w),
      |u AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY t),
      |bi0 AS (SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
      |        FROM w WHERE len(w) >= 2),
      |bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM bi0 GROUP BY w1, w2),
      |tot AS (SELECT (SELECT SUM(n) FROM u) AS tot_t, (SELECT SUM(n12) FROM bi) AS tot_b)
      |SELECT w1, w2, n12,
      |  round((CAST(n12 AS DOUBLE) * tot_t * tot_t) /
      |        (CAST(tot_b AS DOUBLE) * u1.n * u2.n), 6) AS lift
      |FROM bi JOIN u u1 ON u1.t = w1 JOIN u u2 ON u2.t = w2 CROSS JOIN tot
      |WHERE n12 >= 5
      |ORDER BY lift DESC, w1, w2 LIMIT 25""".stripMargin

  /** Asymmetric containment dedup ([[Dedup.containmentPairs]]): the
    * quote/excerpt/boilerplate-wrapper relation Jaccard misses at
    * size mismatch. Threshold 4/5 as an exact integer cross-multiply. */
  private def q165(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, thresholdNum = 4, thresholdDen = 5)
      .select(col("contained_id"), col("container_id"), col("inter"),
        col("size_contained"), round(col("containment"), 6).as("containment"))
      .orderBy(col("contained_id"), col("container_id"))

  private val q165Sql =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |           FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |       FROM w WHERE len(w) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |j AS (SELECT a_id, b_id, c, sa.n AS na, sb.n AS nb
      |      FROM inter JOIN sizes sa ON sa.doc_id = a_id
      |                 JOIN sizes sb ON sb.doc_id = b_id),
      |d AS (SELECT a_id AS contained_id, b_id AS container_id, c, na AS size_contained FROM j
      |      UNION ALL
      |      SELECT b_id, a_id, c, nb FROM j)
      |SELECT contained_id, container_id, CAST(c AS BIGINT) AS inter,
      |  CAST(size_contained AS BIGINT) AS size_contained,
      |  round(CAST(c AS DOUBLE) / CAST(size_contained AS DOUBLE), 6) AS containment
      |FROM d WHERE c * 5 >= 4 * size_contained
      |ORDER BY contained_id, container_id""".stripMargin

  /** Weighted πps sample ([[Splits.weightedBottomKSample]], sequential
    * Poisson): 25 docs per lang, inclusion ∝ n_chars — exact integer
    * priorities, SQL-replayed verbatim. */
  private def q166(s: SparkSession, d: String): DataFrame =
    Splits.weightedBottomKSample(
        t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "n_chars", "lang", k = 25)
      .orderBy(col("lang"), col("sample_rank"))

  private val q166Sql =
    """WITH p AS (
      |  SELECT doc_id, lang, n_chars,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296) * 1048576
      |      // least(n_chars, 1073741824) AS sample_prio
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |r AS (
      |  SELECT doc_id, lang, n_chars, sample_prio,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY sample_prio, doc_id) AS INTEGER) AS sample_rank
      |  FROM p)
      |SELECT doc_id, lang, n_chars, sample_prio, sample_rank
      |FROM r WHERE sample_rank <= 25 ORDER BY lang, sample_rank""".stripMargin

  /** Exact all-pairs sparse cosine ([[graft.operators.AllPairs]],
    * Bayardo 2007): weighted-term-vector angle over integer tf·idf —
    * catches same-topic/template pairs whose wording diverged past
    * shingle overlap. Integer dots/norms + IEEE sqrt = deterministic
    * doubles, so the unrounded threshold filter agrees bit-for-bit with
    * the oracle. */
  private def q169(s: SparkSession, d: String): DataFrame =
    graft.operators.AllPairs.cosinePairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.8)
      .select(col("a_id"), col("b_id"), col("dot"), round(col("cos"), 6).as("cos"))
      .orderBy(col("a_id"), col("b_id"))

  private val q169Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id AS doc, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY 1, 2),
      |nn AS (SELECT COUNT(DISTINCT doc) AS n FROM tf),
      |dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |w0 AS (SELECT doc, term,
      |         tf * (length(bin(nn.n)) - length(bin(df))) AS w
      |       FROM tf JOIN dfc USING (term) CROSS JOIN nn),
      |w AS (SELECT doc, term, w FROM w0 WHERE w > 0),
      |norms AS (SELECT doc, SUM(w * w) AS nrm FROM w GROUP BY doc),
      |dots AS (SELECT a.doc AS a_id, b.doc AS b_id, SUM(a.w * b.w) AS dot
      |         FROM w a JOIN w b ON a.term = b.term AND a.doc < b.doc
      |         GROUP BY 1, 2),
      |sc AS (SELECT a_id, b_id, CAST(dot AS BIGINT) AS dot,
      |         CAST(dot AS DOUBLE) /
      |           sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cos
      |       FROM dots JOIN norms na ON na.doc = a_id
      |                 JOIN norms nb ON nb.doc = b_id)
      |SELECT a_id, b_id, dot, round(cos, 6) AS cos
      |FROM sc WHERE cos >= 0.8 ORDER BY a_id, b_id""".stripMargin

  /** Per-row importance resampling ([[Splits.resampleByRowWeight]]):
    * longer docs get proportionally more epochs — weight in basis
    * points = min(n_chars·10000/2000, 30000), i.e. chars/2000 capped at
    * 3.0×, all integer arithmetic replayed verbatim by the oracle. */
  private def q170(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
      least(expr("(n_chars * 10000) div 2000"), lit(30000L)).as("w_bp"))
    Splits.resampleByRowWeight(docs, "doc_id", "w_bp")
      .orderBy(col("doc_id"), col("copy_id"))
  }

  private val q170Sql =
    """WITH w AS (
      |  SELECT doc_id, lang,
      |    least((n_chars * 10000) // 2000, 30000) AS w_bp,
      |    ((doc_id % 2147483648) * 2654435761) % 4294967296 % 10000 AS grid
      |  FROM documents WHERE n_chars > 0),
      |c AS (
      |  SELECT doc_id, lang, w_bp,
      |    w_bp // 10000 + CASE WHEN grid < w_bp % 10000 THEN 1 ELSE 0 END AS copies
      |  FROM w)
      |SELECT doc_id, lang, w_bp, CAST(unnest(range(copies)) AS BIGINT) AS copy_id
      |FROM c WHERE copies > 0 ORDER BY doc_id, copy_id""".stripMargin

  /** Exact phrase search over the persisted inverted index
    * ([[graft.search.InvertedIndex.phraseSearch]]): bucket-pruned
    * conjunctive candidates + adjacency verify on candidate texts only —
    * no positional postings. Oracle replays the phrase semantics over
    * the whole corpus relationally (the index is the optimization; the
    * answer must be corpus-truth). */
  private def q171(s: SparkSession, d: String): DataFrame = {
    import graft.search.InvertedIndex
    val docs = t(s, d, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-q171").toString
    InvertedIndex.build(docs, "doc_id", "text", dir, tok = InvertedIndex.TokAlnum)
    InvertedIndex.phraseSearch(s, dir, docs, "doc_id", "text",
      Seq("table", "hash"), k = 20)
  }

  private val q171Sql =
    """WITH j AS (
      |  SELECT doc_id,
      |    chr(31) || array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), chr(31)) || chr(31) AS s
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CAST((length(s) - length(replace(s, chr(31) || 'table' || chr(31) || 'hash' || chr(31), chr(31))))
      |      // (length('table hash') + 1) AS BIGINT) AS n_occ
      |  FROM j)
      |SELECT doc_id, n_occ FROM sc WHERE n_occ > 0
      |ORDER BY n_occ DESC, doc_id LIMIT 20""".stripMargin

  /** Chi-square association audit ([[graft.operators.Association]]):
    * lang vs source independence — corpus-metadata leak detection. One
    * corpus count aggregate; everything else runs on the bounded cell
    * grid; decimal term accumulation keeps χ² partitioning-invariant. */
  private def q174(s: SparkSession, d: String): DataFrame =
    graft.operators.Association.chiSquare(t(s, d, "documents"), "lang", "source")
      .select(col("n"), col("cells"), col("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(col("cramers_v"), 6).as("cramers_v"))

  private val q174Sql =
    """WITH cells AS (
      |  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS nab
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY a),
      |ct AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY b),
      |tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n,
      |          CAST(COUNT(*) AS BIGINT) AS cells,
      |          CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
      |          CAST(COUNT(DISTINCT b) AS BIGINT) AS c FROM cells),
      |terms AS (
      |  SELECT n, cells, r, c,
      |    CAST((CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
      |       * (CAST(nab AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
      |       / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
      |       - (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(38,12)) AS t
      |  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot),
      |agg AS (
      |  SELECT n, cells, r, c, SUM(t) AS s FROM terms GROUP BY n, cells, r, c)
      |SELECT n, cells, (r - 1) * (c - 1) AS dof,
      |  round(CAST(n AS DOUBLE) + CAST(s AS DOUBLE), 6) AS chi2,
      |  round(CASE WHEN r = 1 OR c = 1 THEN NULL
      |        ELSE sqrt((CAST(n AS DOUBLE) + CAST(s AS DOUBLE)) /
      |                  (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE))) END, 6) AS cramers_v
      |FROM agg""".stripMargin

  /** Gini concentration audit ([[graft.operators.Inequality]]): how
    * lopsided is character mass across documents within each language —
    * exact rank-sum formulation, one closing division. */
  private def q175(s: SparkSession, d: String): DataFrame =
    graft.operators.Inequality.gini(t(s, d, "documents"), "lang", "n_chars", "doc_id")
      .select(col("lang"), col("n"), col("total"), round(col("gini"), 6).as("gini"))
      .orderBy(col("lang"))

  private val q175Sql =
    """WITH r AS (
      |  SELECT lang, CAST(n_chars AS BIGINT) AS x,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rk
      |  FROM documents),
      |a AS (
      |  SELECT lang, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS total,
      |    CAST(SUM(rk * x) AS BIGINT) AS rx
      |  FROM r GROUP BY lang)
      |SELECT lang, n, total,
      |  round(CASE WHEN total = 0 THEN NULL
      |        ELSE (2.0 * CAST(rx AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(total AS DOUBLE)) /
      |             (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) END, 6) AS gini
      |FROM a ORDER BY lang""".stripMargin

  /** Hashing-trick featurizer ([[graft.operators.FeatureHash]]): fixed
    * 32-dim signed-hash features as exact-integer sparse triples — no
    * vocabulary table, no fitting pass; the oracle replays the full
    * polynomial→Knuth→sign hash stack. */
  private def q177(s: SparkSession, d: String): DataFrame =
    graft.operators.FeatureHash.featureHash(t(s, d, "documents"), "doc_id", "text",
        dims = 32)
      .orderBy(col("doc_id"), col("dim"))

  private val q177Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |k AS (SELECT doc_id, term, tf,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(term, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS key
      |  FROM tf),
      |t2 AS (SELECT doc_id,
      |    CAST((((key % 2147483648) * 2654435761) % 4294967296) % 32 AS INTEGER) AS dim,
      |    tf * (key % 2 * 2 - 1) AS v
      |  FROM k)
      |SELECT doc_id, dim, CAST(SUM(v) AS BIGINT) AS value
      |FROM t2 GROUP BY doc_id, dim HAVING SUM(v) <> 0
      |ORDER BY doc_id, dim""".stripMargin

  /** Count-min sketch ([[graft.operators.Frequency.countMinBuild]]):
    * point token frequencies from a 4×1024 counter grid. In-query gate:
    * every estimate must satisfy the CMS guarantee est ≥ true (zero
    * rows otherwise); the oracle rebuilds the sketch bit-for-bit. */
  private def q178(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = t(s, d, "documents").select(
      explode(filter(split(col("text"), " "), w => w =!= "")).as("term"))
    val sketch = graft.operators.Frequency.countMinBuild(toks, "term").cache()
    val probes = Seq("table", "hash", "spark", "query", "join", "vector",
      "window", "scan", "nosuchtokenever").toDF("term")
    val est = graft.operators.Frequency.countMinEstimate(sketch, probes, "term")
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("__n0"))
    val truth = probes.join(counts, Seq("term"), "left")
      .select(col("term"), coalesce(col("__n0"), lit(0L)).as("true_n"))
    val out = est.join(truth, "term")
      .select(col("term"), col("est"), col("true_n"))
    val ok = out.filter(col("est") < col("true_n")).isEmpty // CMS guarantee
    out.filter(lit(ok)).orderBy(col("term"))
  }

  private val q178Sql =
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM documents),
      |k AS (SELECT term,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(term, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS key
      |  FROM tok),
      |rows_ AS (SELECT unnest(range(4)) AS row_),
      |cells AS (
      |  SELECT row_, CAST((((((key + row_ * 1000003) % 1000000007) % 2147483648)
      |    * 2654435761) % 4294967296) % 1024 AS INTEGER) AS cell,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM k CROSS JOIN rows_ GROUP BY 1, 2),
      |q(term) AS (VALUES ('table'), ('hash'), ('spark'), ('query'), ('join'),
      |  ('vector'), ('window'), ('scan'), ('nosuchtokenever')),
      |qk AS (SELECT term,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(term, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS key
      |  FROM q),
      |qc AS (
      |  SELECT term, row_, CAST((((((key + row_ * 1000003) % 1000000007) % 2147483648)
      |    * 2654435761) % 4294967296) % 1024 AS INTEGER) AS cell
      |  FROM qk CROSS JOIN rows_),
      |est AS (
      |  SELECT qc.term, CAST(MIN(COALESCE(cells.n, 0)) AS BIGINT) AS est
      |  FROM qc LEFT JOIN cells ON cells.row_ = qc.row_ AND cells.cell = qc.cell
      |  GROUP BY qc.term),
      |tru AS (
      |  SELECT q.term, CAST(COUNT(tok.term) AS BIGINT) AS true_n
      |  FROM q LEFT JOIN tok ON tok.term = q.term GROUP BY q.term)
      |SELECT term, est, true_n FROM est JOIN tru USING (term)
      |ORDER BY term""".stripMargin

  /** Cross-source contamination matrix ([[graft.operators.Overlap]]):
    * pairwise shared distinct word-trigrams between sources with the
    * Szymkiewicz–Simpson overlap coefficient — the q83 leakage check at
    * source granularity. */
  private def q180(s: SparkSession, d: String): DataFrame =
    graft.operators.Overlap.sourceOverlap(t(s, d, "documents"), "text", "source",
        n = 3)
      .select(col("source_a"), col("source_b"), col("shared"),
        col("na"), col("nb"), round(col("overlap"), 6).as("overlap"))
      .orderBy(col("source_a"), col("source_b"))

  private val q180Sql =
    """WITH w AS (
      |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (SELECT DISTINCT source,
      |         unnest(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |       FROM w WHERE len(w) >= 3),
      |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM sh GROUP BY source),
      |pr AS (SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(COUNT(*) AS BIGINT) AS shared
      |       FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      |       GROUP BY 1, 2)
      |SELECT source_a, source_b, shared, pa.n_distinct AS na, pb.n_distinct AS nb,
      |  round(CAST(shared AS DOUBLE) / CAST(least(pa.n_distinct, pb.n_distinct) AS DOUBLE), 6) AS overlap
      |FROM pr JOIN ps pa ON pa.source = source_a
      |        JOIN ps pb ON pb.source = source_b
      |ORDER BY source_a, source_b""".stripMargin

  /** Incremental all-pairs cosine against the standing corpus
    * ([[graft.operators.AllPairs.cosineAgainstCorpus]]): the per-ingest
    * near-copy gate — batch = every 10th document, corpus = the rest;
    * the corpus is never self-joined. */
  private def q181(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    graft.operators.AllPairs.cosineAgainstCorpus(batch, corpus,
        "doc_id", "text", threshold = 0.8)
      .select(col("batch_id"), col("corpus_id"), col("dot"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  private val q181Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id AS doc, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY 1, 2),
      |nn AS (SELECT COUNT(DISTINCT doc) AS n FROM tf),
      |dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |w0 AS (SELECT doc, term,
      |         tf * (length(bin(nn.n)) - length(bin(df))) AS w
      |       FROM tf JOIN dfc USING (term) CROSS JOIN nn),
      |w AS (SELECT doc, term, w FROM w0 WHERE w > 0),
      |norms AS (SELECT doc, SUM(w * w) AS nrm FROM w GROUP BY doc),
      |dots AS (SELECT a.doc AS batch_id, b.doc AS corpus_id, SUM(a.w * b.w) AS dot
      |         FROM w a JOIN w b ON a.term = b.term AND a.doc <> b.doc
      |         WHERE a.doc % 10 = 7 AND b.doc % 10 <> 7
      |         GROUP BY 1, 2),
      |sc AS (SELECT batch_id, corpus_id, CAST(dot AS BIGINT) AS dot,
      |         CAST(dot AS DOUBLE) /
      |           sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cos
      |       FROM dots JOIN norms na ON na.doc = batch_id
      |                 JOIN norms nb ON nb.doc = corpus_id)
      |SELECT batch_id, corpus_id, dot, round(cos, 6) AS cos
      |FROM sc WHERE cos >= 0.8 ORDER BY batch_id, corpus_id""".stripMargin

  /** Per-source distribution drift ([[graft.operators.Drift]]): exact
    * integer Total-Variation distance of each source's token mix from
    * the corpus mix — no logarithms, absent terms folded in
    * algebraically, one pinned division. */
  private def q182(s: SparkSession, d: String): DataFrame =
    graft.operators.Drift.sourceTv(t(s, d, "documents"), "text", "source")
      .select(col("source"), col("n_tokens"), round(col("tv"), 6).as("tv"))
      .orderBy(col("source"))

  private val q182Sql =
    """WITH st AS (
      |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents),
      |c AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cst FROM st GROUP BY 1, 2),
      |corp AS (SELECT t, CAST(SUM(cst) AS BIGINT) AS ct FROM c GROUP BY t),
      |tot AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS ts FROM c GROUP BY source),
      |g AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM corp),
      |a AS (
      |  SELECT c.source, tot.ts, g.tt,
      |    CAST(SUM(abs(cst * tt - ct * ts)) AS BIGINT) AS present,
      |    CAST(SUM(ct) AS BIGINT) AS covered
      |  FROM c JOIN corp USING (t) JOIN tot USING (source) CROSS JOIN g
      |  GROUP BY 1, 2, 3)
      |SELECT source, ts AS n_tokens,
      |  round(CAST(present + ts * (tt - covered) AS DOUBLE) /
      |        (2.0 * CAST(ts AS DOUBLE) * CAST(tt AS DOUBLE)), 6) AS tv
      |FROM a ORDER BY source""".stripMargin

  /** End-to-end corpus-release audit pipeline — the round-10 operators
    * composed as ONE DAG (the q122 pattern for the audit family):
    * TV-drift gate drops divergent feeds → contamination matrix drops
    * the duplicated side of high-overlap source pairs → per-lang
    * difficulty binning (NTILE) → bin-weighted πps sample (20/lang) →
    * per-(lang, bin) release accounting. Both audits run on the FULL
    * corpus, filters apply once; every stage is exact/pinned, so the
    * oracle replays the whole chain and a semantic change to ANY stage
    * breaks the hash. */
  private def q183(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val calm = graft.operators.Drift.sourceTv(docs, "text", "source")
      .filter(col("tv") <= 0.065).select(col("source"))
    val contaminated = graft.operators.Overlap
      .sourceOverlap(docs, "text", "source", n = 3)
      .filter(col("overlap") >= 0.115)
      .select(col("source_b").as("source")).distinct()
    val kept = docs.join(broadcast(calm), "source")
      .join(broadcast(contaminated), Seq("source"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val binned = graft.operators.Binning.equalFrequency(
      kept, "lang", "n_chars", "doc_id", bins = 10)
    Splits.weightedBottomKSample(binned, "doc_id", "bin", "lang", k = 20)
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("bin"))
  }

  private val q183Sql =
    """WITH dtok AS (
      |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents),
      |dc AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cst FROM dtok GROUP BY 1, 2),
      |dcorp AS (SELECT t, CAST(SUM(cst) AS BIGINT) AS ct FROM dc GROUP BY t),
      |dtot AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS ts FROM dc GROUP BY source),
      |dg AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM dcorp),
      |da AS (
      |  SELECT dc.source, dtot.ts, dg.tt,
      |    CAST(SUM(abs(cst * tt - ct * ts)) AS BIGINT) AS present,
      |    CAST(SUM(ct) AS BIGINT) AS covered
      |  FROM dc JOIN dcorp USING (t) JOIN dtot USING (source) CROSS JOIN dg
      |  GROUP BY 1, 2, 3),
      |calm AS (
      |  SELECT source FROM da
      |  WHERE CAST(present + ts * (tt - covered) AS DOUBLE) /
      |        (2.0 * CAST(ts AS DOUBLE) * CAST(tt AS DOUBLE)) <= 0.065),
      |ow AS (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |       FROM documents),
      |osh AS (SELECT DISTINCT source,
      |          unnest(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |        FROM ow WHERE len(w) >= 3),
      |ops AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM osh GROUP BY source),
      |opr AS (SELECT a.source AS source_a, b.source AS source_b,
      |          CAST(COUNT(*) AS BIGINT) AS shared
      |        FROM osh a JOIN osh b ON a.s = b.s AND a.source < b.source
      |        GROUP BY 1, 2),
      |contaminated AS (
      |  SELECT DISTINCT source_b AS source
      |  FROM opr JOIN ops pa ON pa.source = source_a
      |           JOIN ops pb ON pb.source = source_b
      |  WHERE CAST(shared AS DOUBLE) /
      |        CAST(least(pa.n_distinct, pb.n_distinct) AS DOUBLE) >= 0.115),
      |kept AS (
      |  SELECT doc_id, lang, n_chars FROM documents
      |  WHERE source IN (SELECT source FROM calm)
      |    AND source NOT IN (SELECT source FROM contaminated)),
      |b AS (
      |  SELECT doc_id, lang,
      |    NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bin
      |  FROM kept),
      |p AS (
      |  SELECT doc_id, lang, bin,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296) * 1048576
      |      // least(bin, 1073741824) AS prio
      |  FROM b),
      |r AS (
      |  SELECT lang, bin,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY prio, doc_id) AS rn
      |  FROM p)
      |SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n
      |FROM r WHERE rn <= 20 GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  /** Boolean AND-NOT serving + compaction on the persisted inverted
    * index ([[graft.search.InvertedIndex.searchNot]] / `compact`): after
    * an incremental mutation epoch (a corpus slice re-added with a new
    * term), the query asks for documents containing BOTH positives and
    * NEITHER negative — negation served from ≤ |mustNot| pruned posting
    * buckets and one anti-join, never a corpus scan. The gate then runs
    * [[graft.search.InvertedIndex.compact]] (the store OPTIMIZE with the
    * index's term clustering restored) and zeroes the output unless
    * serving is row-identical before and after — compaction must be
    * invisible to queries. */
  private def q186(s: SparkSession, d: String): DataFrame = {
    import graft.search.InvertedIndex
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q186").toString
    InvertedIndex.build(docs, "doc_id", "text", dir)
    InvertedIndex.add(s, dir,
      docs.filter(col("doc_id") % 11 === 2)
        .withColumn("text", concat(col("text"), lit(" graftneg"))),
      "doc_id", "text")
    val must = Seq("table", "vector"); val mustNot = Seq("graftneg", "merge")
    val before = InvertedIndex.searchNot(s, dir, must, mustNot, k = 15)
      .collect().toSeq
    InvertedIndex.compact(s, dir)
    val res = InvertedIndex.searchNot(s, dir, must, mustNot, k = 15)
    if (res.collect().toSeq == before) res else res.limit(0)
  }

  private val q186Sql =
    """WITH v AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 2 THEN text || ' graftneg' ELSE text END AS text
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM v),
      |n AS (SELECT COUNT(*) AS nd FROM v),
      |tfq AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM occ
      |  WHERE term IN ('table', 'vector') GROUP BY 1, 2),
      |dfq AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM occ
      |  WHERE term IN ('table', 'vector') GROUP BY 1),
      |w AS (SELECT term, CAST(length(bin(nd)) - length(bin(df)) AS INTEGER) AS w
      |      FROM dfq CROSS JOIN n),
      |neg AS (SELECT DISTINCT doc_id FROM occ WHERE term IN ('graftneg', 'merge')),
      |sc AS (
      |  SELECT doc_id, CAST(SUM(tf * w) AS BIGINT) AS score
      |  FROM tfq JOIN w USING (term)
      |  WHERE doc_id NOT IN (SELECT doc_id FROM neg)
      |  GROUP BY doc_id HAVING COUNT(DISTINCT term) = 2)
      |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  /** Trainable bigram-LM surprisal ([[graft.operators.NgramLm]]) — the
    * CCNet train-on-reference / score-target quality signal: the model
    * trains on a trusted corpus slice (`doc_id % 3 = 0` stands in for
    * "curated reference"), scores EVERY document, and Laplace smoothing
    * keeps unseen contexts/transitions scoreable — which is the whole
    * point of the cross-corpus variant over q96's self-scoring (where an
    * unseen bigram cannot exist). Exact integer bits end to end; only
    * the final per-doc mean divides. */
  private def q185(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val model = graft.operators.NgramLm.train(
      docs.filter(col("doc_id") % 3 === 0), "text")
    graft.operators.NgramLm.score(docs, "doc_id", "text", model)
      .orderBy(col("doc_id"))
  }

  private val q185Sql =
    """WITH rw AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents WHERE doc_id % 3 = 0),
      |v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
      |      FROM (SELECT unnest(w) AS t FROM rw)),
      |rbg AS (SELECT unnest(list_transform(range(len(w) - 1),
      |          i -> {'w1': w[i+1], 'w2': w[i+2]})) AS b
      |        FROM rw WHERE len(w) >= 2),
      |c2 AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      |       FROM rbg GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |tw AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |       FROM documents),
      |tbg AS (SELECT doc_id, unnest(list_transform(range(len(w) - 1),
      |          i -> {'w1': w[i+1], 'w2': w[i+2]})) AS b
      |        FROM tw WHERE len(w) >= 2),
      |p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM tbg),
      |sc AS (SELECT doc_id,
      |         CAST(length(bin(COALESCE(c1, 0) + v)) -
      |              length(bin(COALESCE(c12, 0) + 1)) AS BIGINT) AS s
      |       FROM p LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
      |            CROSS JOIN v),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |          CAST(SUM(s) AS BIGINT) AS surprisal_bits
      |        FROM sc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(COALESCE(surprisal_bits, 0) AS BIGINT) AS surprisal_bits,
      |  COALESCE(round(CAST(surprisal_bits AS DOUBLE) / n_bigrams, 6), 0.0) AS mean_bits
      |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  /** KMV-sketched source-contamination matrix
    * ([[graft.operators.Overlap.sketchOverlap]]): per-source bottom-64
    * signatures over deterministic 3-shingle hashes, pairwise Jaccard
    * estimated from the merged signatures — the bounded-state path for
    * q180's exact matrix (whose only corpus-scale stage is the distinct-
    * shingle shuffle). The replayable hash stack makes the ESTIMATE
    * itself oracle-exact: DuckDB rebuilds the signatures hash-for-hash
    * and must land on identical estimates, not merely close ones. */
  private def q189(s: SparkSession, d: String): DataFrame =
    graft.operators.Overlap.sketchOverlap(
      t(s, d, "documents"), "text", "source", n = 3, k = 64)
      .orderBy(col("source_a"), col("source_b"))

  private val q189Sql =
    """WITH w AS (
      |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT source, unnest(list_transform(range(len(w) - 2),
      |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |  FROM w WHERE len(w) >= 3),
      |keyd AS (
      |  SELECT DISTINCT source,
      |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
      |        (a, b) -> (a * 31 + b) % 1000000007) % 2147483648)
      |      * 2654435761) % 4294967296 AS h
      |  FROM sh),
      |bk AS (
      |  SELECT source, h FROM (
      |    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
      |    FROM keyd) WHERE rk <= 64),
      |srcs AS (SELECT DISTINCT source FROM bk),
      |pairs AS (SELECT x.source AS sa, y.source AS sb
      |          FROM srcs x JOIN srcs y ON x.source < y.source),
      |u AS (
      |  SELECT sa, sb, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
      |    SELECT p.sa, p.sb, k.h, 1 AS ia, 0 AS ib
      |    FROM pairs p JOIN bk k ON k.source = p.sa
      |    UNION ALL
      |    SELECT p.sa, p.sb, k.h, 0 AS ia, 1 AS ib
      |    FROM pairs p JOIN bk k ON k.source = p.sb)
      |  GROUP BY sa, sb, h),
      |r AS (
      |  SELECT sa, sb, h, ia, ib,
      |    ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
      |  FROM u)
      |SELECT sa AS source_a, sb AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS k_union,
      |  CAST(SUM(ia * ib) AS BIGINT) AS in_both,
      |  round(CAST(SUM(ia * ib) AS DOUBLE) / COUNT(*), 6) AS est_jaccard
      |FROM r WHERE rk <= 64
      |GROUP BY sa, sb ORDER BY sa, sb""".stripMargin

  /** Near-duplicate COMMUNITIES: the q41 Jaccard pair graph fed through
    * deterministic label propagation ([[graft.operators.LabelProp]]) —
    * where q85's connected components answer "which docs are
    * transitively linked", communities answer "which docs cluster
    * densely" (a long weak chain of borderline pairs splits instead of
    * collapsing into one mega-cluster). One composed DAG, the
    * q122/q183 composition discipline: a semantic change to either
    * stage breaks the oracle hash. */
  private def q195(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(
      t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.8)
    graft.operators.LabelProp.run(pairs, "a_id", "b_id", iterations = 3)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label"))
      .limit(30)
  }

  private lazy val q195Sql =
    s"""WITH ${pairCtes("0.8")},
       |${graft.operators.LabelProp.oracleCtes(
            "SELECT a_id AS a, b_id AS b FROM pairs", iterations = 3)}
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
       |FROM l3 GROUP BY label ORDER BY n_members DESC, label LIMIT 30""".stripMargin

  /** Per-source dataset fingerprints ([[graft.operators.Fingerprint]]):
    * order-independent release checksums over (doc_id, text, lang,
    * n_chars) — one narrow pass, no sort, and the oracle PROVES the
    * cross-engine property the operator exists for: DuckDB recomputes
    * every checksum from the raw parquet and must match bit-for-bit. */
  private def q196(s: SparkSession, d: String): DataFrame =
    graft.operators.Fingerprint.groupChecksum(t(s, d, "documents"),
      "source", Seq("doc_id", "text", "lang", "n_chars"))
      .orderBy(col("source"))

  private val q196Sql =
    """WITH j AS (
      |  SELECT source,
      |    concat_ws(chr(1),
      |      COALESCE(CAST(doc_id AS VARCHAR), '␀'),
      |      COALESCE(text, '␀'),
      |      COALESCE(lang, '␀'),
      |      COALESCE(CAST(n_chars AS VARCHAR), '␀')) AS s
      |  FROM documents),
      |h AS (
      |  SELECT source,
      |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) % 2147483648)
      |     * 2654435761) % 4294967296 AS h
      |  FROM j)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(h) % 4611686018427387904 AS BIGINT) AS checksum
      |FROM h GROUP BY source ORDER BY source""".stripMargin

  /** Curriculum scheduling ([[graft.operators.Splits.curriculumOrder]])
    * over the trainable-LM difficulty signal: q185's integer surprisal
    * shards the corpus into bits-bands (easy → hard), the q92 seeded
    * order shuffles each band reproducibly — one composed DAG whose
    * oracle replays scoring, sharding, and ranking end to end. */
  private def q199(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val model = graft.operators.NgramLm.train(
      docs.filter(col("doc_id") % 3 === 0), "text")
    val scored = graft.operators.NgramLm.score(docs, "doc_id", "text", model)
    Splits.curriculumOrder(scored, "doc_id", "surprisal_bits", seed = 11L)
      .select(col("doc_id"), col("shard"), col("curriculum_rank"))
      .orderBy(col("shard"), col("curriculum_rank"))
  }

  private val q199Sql =
    """WITH rw AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents WHERE doc_id % 3 = 0),
      |v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
      |      FROM (SELECT unnest(w) AS t FROM rw)),
      |rbg AS (SELECT unnest(list_transform(range(len(w) - 1),
      |          i -> {'w1': w[i+1], 'w2': w[i+2]})) AS b
      |        FROM rw WHERE len(w) >= 2),
      |c2 AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      |       FROM rbg GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |tw AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |       FROM documents),
      |tbg AS (SELECT doc_id, unnest(list_transform(range(len(w) - 1),
      |          i -> {'w1': w[i+1], 'w2': w[i+2]})) AS b
      |        FROM tw WHERE len(w) >= 2),
      |p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM tbg),
      |sc AS (SELECT doc_id,
      |         CAST(length(bin(COALESCE(c1, 0) + v)) -
      |              length(bin(COALESCE(c12, 0) + 1)) AS BIGINT) AS s
      |       FROM p LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
      |            CROSS JOIN v),
      |agg AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS sb FROM sc GROUP BY doc_id),
      |fin AS (SELECT d.doc_id, CAST(COALESCE(sb, 0) AS BIGINT) AS sb
      |        FROM documents d LEFT JOIN agg USING (doc_id)),
      |sch AS (SELECT doc_id,
      |          CAST(length(bin(greatest(sb, 0) + 1)) AS INTEGER) AS shard,
      |          (xor(doc_id % 2147483648, 11) * 2654435761) % 4294967296 AS k
      |        FROM fin)
      |SELECT doc_id, shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT)
      |    AS curriculum_rank
      |FROM sch ORDER BY shard, curriculum_rank""".stripMargin

  /** Two-sample KS drift, each source vs its complement, over doc
    * length — distribution-SHAPE drift beside q182's token-mix TV. The
    * sup runs on the pooled value grid with exact BIGINT numerators
    * (D·n_s·n_rest), one pinned double division closes; see
    * [[graft.operators.Drift.ksPerSource]] for the algebra and the
    * |values|×|sources| grid scale shape (corpus scanned once, never
    * shuffled). */
  private def q200(s: SparkSession, d: String): DataFrame =
    graft.operators.Drift.ksPerSource(
        t(s, d, "documents").select(col("source"), col("n_chars")),
        "n_chars", "source")
      .select(col("source"), col("n_source"), col("n_rest"),
        col("ks_num"), col("ks"))
      .orderBy(col("source"))

  private val q200Sql =
    """WITH c AS (SELECT source, n_chars AS v, COUNT(*) AS cnt
      |           FROM documents GROUP BY 1, 2),
      |vt AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS ct FROM c GROUP BY v),
      |ns AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS nsrc FROM c GROUP BY source),
      |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM vt),
      |grid AS (SELECT ns.source, vt.v, vt.ct, COALESCE(c.cnt, 0) AS cnt, ns.nsrc
      |         FROM vt CROSS JOIN ns
      |         LEFT JOIN c ON c.source = ns.source AND c.v = vt.v),
      |cum AS (SELECT source, nsrc,
      |          SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cums,
      |          SUM(ct) OVER (PARTITION BY source ORDER BY v) AS cumt
      |        FROM grid),
      |m AS (SELECT source, nsrc, (SELECT n FROM tot) - nsrc AS nrest,
      |        MAX(ABS(cums * ((SELECT n FROM tot) - nsrc)
      |                - (cumt - cums) * nsrc)) AS ks_num
      |      FROM cum GROUP BY source, nsrc)
      |SELECT source, nsrc AS n_source, nrest AS n_rest,
      |  CAST(ks_num AS BIGINT) AS ks_num,
      |  CAST(ks_num AS DOUBLE) / CAST(nsrc * nrest AS DOUBLE) AS ks
      |FROM m ORDER BY source""".stripMargin

  /** Rank-sum / ROC-AUC separability audit: per source, does document
    * LENGTH separate English from non-English docs? AUC = P(len⁺ >
    * len⁻) with ties at ½ — the validity check a curator runs before
    * trusting a cheap score as a filter. Exact 2·U₁ BIGINT via the
    * tie-averaged rank identity; see [[graft.operators.RankTests]]. */
  private def q201(s: SparkSession, d: String): DataFrame =
    graft.operators.RankTests.aucPerGroup(
        t(s, d, "documents").select(col("source"), col("lang"), col("n_chars")),
        "source", "n_chars", col("lang") === "en")
      .select(col("source"), col("n_pos"), col("n_neg"), col("u2"), col("auc"))
      .orderBy(col("source"))

  private val q201Sql =
    """WITH r AS (SELECT source, n_chars, (lang = 'en') AS pos,
      |    RANK() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
      |    COUNT(*) OVER (PARTITION BY source, n_chars) AS tie
      |  FROM documents),
      |g AS (SELECT source,
      |    CAST(SUM(CASE WHEN pos THEN 2 * rk + tie - 1 ELSE 0 END) AS BIGINT) AS r2,
      |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    COUNT(*) AS n
      |  FROM r GROUP BY source)
      |SELECT source, n1 AS n_pos, n - n1 AS n_neg,
      |  r2 - n1 * (n1 + 1) AS u2,
      |  CASE WHEN n1 = 0 OR n = n1 THEN NULL
      |    ELSE CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
      |         / CAST(2 * n1 * (n - n1) AS DOUBLE) END AS auc
      |FROM g ORDER BY source""".stripMargin

  /** Blocked fuzzy record linkage over part names — the pairwise
    * entity-resolution form of q39's probe scan: block on (first
    * token, token count), verify candidates with threshold-bounded
    * levenshtein ≤ 2, and emit the bounded per-record face (candidate
    * count, match count, deterministic best match). Pair space is
    * Σ|block|², never n²; see [[graft.operators.Linkage]]. */
  private def q202(s: SparkSession, d: String): DataFrame = {
    val words = split(col("p_name"), " ")
    val bk = concat_ws("|", element_at(words, 1), size(words).cast("string"))
    graft.operators.Linkage.bestMatch(
        t(s, d, "part").select(col("p_partkey"), col("p_name")),
        "p_partkey", "p_name", bk, maxDist = 2)
      .select(col("id"), col("n_block"), col("n_match"),
        col("best_dist"), col("best_id"))
      .orderBy(col("id"))
  }

  private val q202Sql =
    """WITH p AS (SELECT p_partkey, p_name,
      |    string_split(p_name, ' ')[1] || '|'
      |      || CAST(len(string_split(p_name, ' ')) AS VARCHAR) AS bk
      |  FROM part),
      |pairs AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |    levenshtein(a.p_name, b.p_name) AS dist
      |  FROM p a JOIN p b ON a.bk = b.bk AND a.p_partkey <> b.p_partkey),
      |agg AS (SELECT id_a, COUNT(*) AS n_block,
      |    CAST(SUM(CASE WHEN dist <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |    MIN(CASE WHEN dist <= 2 THEN dist * 10000000 + id_b END) AS best
      |  FROM pairs GROUP BY id_a)
      |SELECT p.p_partkey AS id,
      |  COALESCE(n_block, 0) AS n_block, COALESCE(n_match, 0) AS n_match,
      |  CAST(best // 10000000 AS BIGINT) AS best_dist,
      |  CAST(best % 10000000 AS BIGINT) AS best_id
      |FROM p LEFT JOIN agg ON agg.id_a = p.p_partkey
      |ORDER BY id""".stripMargin

  /** Poisson-bootstrap CI for mean doc length per source — the
    * corpus-scale resampling scheme (per-row independent Poisson(1)
    * weights, B replicates in ONE narrow pass; shuffle carries
    * sources×B summary rows, never corpus×B). Weights come from a
    * deterministic integer hash through precomputed inverse-CDF grid
    * thresholds, replicate means are exact-BIGINT ratios, and the CI
    * bounds are exact order statistics over the B means — the whole
    * pipeline replays bit-for-bit in SQL. See
    * [[graft.operators.Bootstrap]]. */
  private def q203(s: SparkSession, d: String): DataFrame =
    graft.operators.Bootstrap.poissonCi(
        t(s, d, "documents").select(col("source"), col("doc_id"), col("n_chars")),
        "source", "n_chars", "doc_id", b = 200)
      .orderBy(col("source"))

  private val q203Sql =
    """WITH b AS (SELECT unnest(range(200)) AS b),
      |u AS (SELECT d.source, d.n_chars, b.b,
      |    ((xor(d.doc_id % 2147483648, (b.b * 1315423911) % 2147483648))
      |      * 2654435761) % 4294967296 AS u
      |  FROM documents d CROSS JOIN b),
      |w AS (SELECT source, n_chars, b,
      |    CASE WHEN u >= 1580030168 THEN 1 ELSE 0 END
      |    + CASE WHEN u >= 3160060337 THEN 1 ELSE 0 END
      |    + CASE WHEN u >= 3950075421 THEN 1 ELSE 0 END
      |    + CASE WHEN u >= 4213413783 THEN 1 ELSE 0 END
      |    + CASE WHEN u >= 4279248373 THEN 1 ELSE 0 END
      |    + CASE WHEN u >= 4292415291 THEN 1 ELSE 0 END AS wt
      |  FROM u),
      |rep AS (SELECT source, b,
      |    CAST(SUM(wt) AS BIGINT) AS den,
      |    CAST(SUM(n_chars * wt) AS BIGINT) AS num
      |  FROM w GROUP BY source, b HAVING SUM(wt) > 0),
      |m AS (SELECT source, b, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS mean_b,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE), b) AS rn,
      |    COUNT(*) OVER (PARTITION BY source) AS nb
      |  FROM rep),
      |ci AS (SELECT source,
      |    MAX(CASE WHEN rn = CAST(floor(0.025 * (nb - 1)) AS BIGINT) + 1
      |             THEN mean_b END) AS lo,
      |    MAX(CASE WHEN rn = CAST(floor(0.975 * (nb - 1)) AS BIGINT) + 1
      |             THEN mean_b END) AS hi
      |  FROM m GROUP BY source),
      |pt AS (SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sx
      |       FROM documents GROUP BY source)
      |SELECT p.source, n, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean, lo, hi
      |FROM pt p JOIN ci USING (source) ORDER BY source""".stripMargin

  /** Quantile normalization across sources: every source's doc-length
    * distribution mapped onto the POOLED distribution, so one global
    * threshold means the same thing for every feed. Element selection
    * on pure integer rank arithmetic (no interpolation); the pooled
    * ranking is a vocab-grid + `explode(sequence)` rank table — NEVER
    * a global window. See [[graft.operators.QuantileNorm]]. */
  private def q206(s: SparkSession, d: String): DataFrame =
    graft.operators.QuantileNorm.toPooled(
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        "source", "n_chars", "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"), col("qnorm"))
      .orderBy(col("doc_id"))

  private val q206Sql =
    """WITH rows_ AS (SELECT doc_id, source, n_chars AS v FROM documents),
      |grid AS (SELECT v, COUNT(*) AS c FROM rows_ GROUP BY v),
      |g2 AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS hi FROM grid),
      |rt AS (SELECT v AS pv, unnest(range(hi - c + 1, hi + 1)) AS rank FROM g2),
      |n AS (SELECT COUNT(*) AS n FROM rows_),
      |rk AS (SELECT doc_id, source, v,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id) AS r,
      |    COUNT(*) OVER (PARTITION BY source) AS ng
      |  FROM rows_),
      |tg AS (SELECT doc_id, source, v,
      |    CASE WHEN ng = 1 THEN ((SELECT n FROM n) - 1) // 2 + 1
      |         ELSE ((r - 1) * ((SELECT n FROM n) - 1)) // (ng - 1) + 1
      |    END AS rank
      |  FROM rk)
      |SELECT doc_id, source, v AS n_chars, pv AS qnorm
      |FROM tg JOIN rt USING (rank) ORDER BY doc_id""".stripMargin

  /** Entity resolution end to end (the Fellegi–Sunter pipeline
    * completed): q202's blocked fuzzy pairs → q85's connected
    * components → one canonical row per entity (cluster size + the
    * min-id member's name). One composed DAG of the engine's own
    * operators — a semantic change in the blocking, the band, or the
    * CC label rule breaks the hash (the q195 composition discipline).
    * CC's min-label IS the canonical member id, so the roll-up is one
    * aggregate + one join back for the name. */
  private def q209(s: SparkSession, d: String): DataFrame = {
    val part = t(s, d, "part").select(col("p_partkey"), col("p_name"))
    // collapse exact duplicates FIRST: a duplicate class of size m is
    // m² dist-0 pairs if linked raw (measured 37 s at sf0.1) but ONE
    // representative node here — the fuzzy join then runs on distinct
    // names only. Components are provably identical: within-class
    // edges only connect what the representative membership already
    // connects, and rep_id = min id of its class, so the component
    // min-label IS still the global min member id.
    val reps = part.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("rep_id"), count(lit(1)).as("n_dup"))
    val words = split(col("p_name"), " ")
    val bk = concat_ws("|", element_at(words, 1), size(words).cast("string"))
    val pairs = graft.operators.Linkage.blockedPairs(
      reps, "rep_id", "p_name", bk, maxDist = 1)
    val cc = graft.operators.Clusters.connectedComponents(
      reps.select(col("rep_id")), "rep_id", pairs, "id_a", "id_b")
    cc.join(reps, "rep_id")
      .groupBy(col("cluster_id"))
      .agg(sum(col("n_dup")).as("n_members"))
      .join(part.select(col("p_partkey").as("cluster_id"),
        col("p_name").as("canonical_name")), "cluster_id")
      .select(col("cluster_id"), col("n_members"), col("canonical_name"))
      .orderBy(col("cluster_id"))
  }

  private val q209Sql =
    """WITH RECURSIVE p AS (SELECT p_partkey, p_name,
      |    string_split(p_name, ' ')[1] || '|'
      |      || CAST(len(string_split(p_name, ' ')) AS VARCHAR) AS bk
      |  FROM part),
      |pairs AS (SELECT a.p_partkey AS ia, b.p_partkey AS ib
      |  FROM p a JOIN p b ON a.bk = b.bk AND a.p_partkey < b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= 1),
      |e AS (SELECT ia AS u, ib AS v FROM pairs UNION ALL SELECT ib, ia FROM pairs),
      |r(u, v) AS (SELECT p_partkey, p_partkey FROM part
      |            UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
      |lab AS (SELECT u AS id, MIN(v) AS cluster_id FROM r GROUP BY u),
      |g AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
      |      FROM lab GROUP BY cluster_id)
      |SELECT g.cluster_id, g.n_members, part.p_name AS canonical_name
      |FROM g JOIN part ON part.p_partkey = g.cluster_id
      |ORDER BY g.cluster_id""".stripMargin

  /** BPE ENCODE with the trained merge table — q137's other half: the
    * corpus vocabulary is re-encoded through the 12 learned merges in
    * training order, and the gate compares the COMPLETE per-word token
    * split ('~'-joined symbols) plus token counts. Any divergence in
    * merge choice, application order, or the boundary-anchored replace
    * (e.g. a merge firing inside a multi-char token) changes some
    * word's encoding and breaks the hash. Encoding is k narrow
    * `replace` projections over the vocab-bounded word table — the
    * corpus is touched once for frequencies and never again. */
  private def q210(s: SparkSession, d: String): DataFrame = {
    import graft.operators.BpeTrainer
    val words = BpeTrainer.wordFreqs(t(s, d, "documents"), "text")
    val (merges, _) = BpeTrainer.train(words, numMerges = 12)
    val seeded = words.select(col("w"),
      concat_ws(" ", split(col("w"), "")).as("toks"), col("cnt"))
    BpeTrainer.applyMerges(seeded, "toks", merges)
      .select(col("w"), col("cnt"), col("toks"),
        size(split(col("toks"), " ")).cast("long").as("n_tokens"))
      .orderBy(col("w"))
  }

  // lazy: same unrolled-CTE training replay as q137Sql, but the word
  // column rides along so the final select carries each word's encoding
  private lazy val q210Sql: String = {
    val steps = 12
    val ctes = scala.collection.mutable.ArrayBuffer(
      """words AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w)""".stripMargin,
      """w0 AS MATERIALIZED (SELECT w, array_to_string(list_transform(range(length(w)), i -> w[i+1]), ' ') AS toks, cnt FROM words)""")
    for (s <- 1 to steps) {
      ctes += s"""p$s AS MATERIALIZED (
        |  SELECT z[1] || ' ' || z[2] AS pr, SUM(cnt) AS c
        |  FROM (SELECT unnest(list_zip(string_split(toks,' '), string_split(toks,' ')[2:])) AS z, cnt FROM w${s - 1})
        |  WHERE z[2] IS NOT NULL GROUP BY 1)""".stripMargin
      ctes += s"b$s AS (SELECT pr FROM p$s ORDER BY c DESC, pr LIMIT 1)"
      ctes += s"""b${s}x AS (SELECT ' ' || pr || ' ' AS pat, ' ' || replace(pr,' ','~') || ' ' AS rep FROM b$s)"""
      ctes += s"""w$s AS MATERIALIZED (SELECT w, trim(replace(replace(' ' || toks || ' ',
        |  (SELECT pat FROM b${s}x), (SELECT rep FROM b${s}x)),
        |  (SELECT pat FROM b${s}x), (SELECT rep FROM b${s}x))) AS toks, cnt FROM w${s - 1})""".stripMargin
    }
    "WITH " + ctes.mkString(",\n") +
      s"\nSELECT w, cnt, toks, CAST(len(string_split(toks, ' ')) AS BIGINT) AS n_tokens" +
      s"\nFROM w$steps ORDER BY w"
  }

  /** Leakage-safe GROUP k-fold over CONTENT: folds keyed by the exact
    * text (the dedup-aware CV protocol — a duplicated document must
    * never sit in both a training and an evaluation fold). The
    * no-straddle invariant is gated in-query (any content group seen
    * in two folds zeroes the output); the compared rows are the
    * per-fold document/group counts. See
    * [[graft.operators.Splits.withGroupKFold]]. */
  private def q211(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val f = Splits.withGroupKFold(docs, "text", k = 5)
    val straddle = f.groupBy(col("text"))
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1).count()
    val out = f.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_groups"))
      .orderBy(col("fold"))
    if (straddle == 0L) out else out.limit(0)
  }

  private val q211Sql =
    """WITH k AS (SELECT doc_id, text,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS key
      |  FROM documents),
      |f AS (SELECT doc_id, text,
      |    CAST((((key % 2147483648) * 2654435761) % 4294967296) % 5 AS INT) AS fold
      |  FROM k)
      |SELECT fold, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_groups
      |FROM f GROUP BY fold ORDER BY fold""".stripMargin

  /** Temperature-flattened language mixing END TO END (the multilingual
    * sampling-temperature recipe, α = ½): data-derived weights
    * w_g = (√p_g / Σ√p) · N / n_g through the deterministic resample —
    * the dominant language thins, the tail languages oversample, the
    * expected row count is preserved. Every float step is
    * engine-portable by construction (IEEE sqrt is correctly rounded,
    * the normalizer folds in sorted-key order, resample thresholds
    * resolve on the 0-9999 integer grid), so the oracle replays the
    * WEIGHT DERIVATION itself, not a literal constant (q101 gates the
    * resample mechanics; this gates the derivation feeding it). */
  private def q212(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
    val w = Splits.temperatureWeights(docs, "lang", alpha = 0.5)
    Splits.resampleByWeight(docs, "doc_id", "lang", w, defaultWeight = 1.0)
      .select(col("doc_id"), col("lang"), col("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))
  }

  private val q212Sql =
    """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      |           FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
      |q AS (SELECT lang, n,
      |        sqrt(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) AS qv
      |      FROM c CROSS JOIN tot),
      |z AS (SELECT list_reduce(list(qv ORDER BY lang), (a, b) -> a + b) AS z
      |      FROM q),
      |w AS (SELECT lang,
      |        ((qv / (SELECT z FROM z)) * CAST((SELECT total FROM tot) AS DOUBLE))
      |          / CAST(n AS DOUBLE) AS w
      |      FROM q),
      |wf AS (SELECT lang, CAST(floor(w) AS BIGINT) AS base,
      |         CAST(floor((w - floor(w)) * 10000 + 0.5) AS BIGINT) AS cut
      |       FROM w),
      |x AS (SELECT doc_id, d.lang, base, cut,
      |        (doc_id % 2147483648) * 2654435761 % 4294967296 % 10000 AS b
      |      FROM documents d JOIN wf ON wf.lang = d.lang),
      |r AS (SELECT doc_id, lang,
      |        base + CASE WHEN b < cut THEN 1 ELSE 0 END AS reps FROM x)
      |SELECT doc_id, lang, CAST(unnest(range(reps)) AS BIGINT) AS copy_id
      |FROM r WHERE reps > 0 ORDER BY doc_id, copy_id""".stripMargin

  /** Operating-point selection: per source, the deepest length-ranked
    * document prefix keeping ≥ ½ precision against the en-language
    * weak label — "what cutoff keeps the filter this clean, and how
    * much survives it". Exact rational feasibility test, rank-based
    * boundary; NULL row for sources with no feasible prefix. See
    * [[graft.operators.RankTests.precisionThreshold]]. */
  private def q213(s: SparkSession, d: String): DataFrame =
    graft.operators.RankTests.precisionThreshold(
        t(s, d, "documents").select(col("source"), col("lang"),
          col("n_chars"), col("doc_id")),
        "source", "n_chars", col("lang") === "en", "doc_id",
        pNum = 1L, pDen = 2L)
      .select(col("source"), col("best_rank"), col("thr_score"),
        col("n_pos_kept"), col("prec"))
      .orderBy(col("source"))

  private val q213Sql =
    """WITH r AS (SELECT source, n_chars, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER
      |      (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS cp
      |  FROM documents),
      |g AS (SELECT source,
      |        MAX(CASE WHEN cp * 2 >= rn * 1 THEN rn END) AS best_rank
      |      FROM r GROUP BY source)
      |SELECT g.source, CAST(best_rank AS BIGINT) AS best_rank,
      |  r.n_chars AS thr_score, CAST(r.cp AS BIGINT) AS n_pos_kept,
      |  CAST(r.cp AS DOUBLE) / CAST(r.rn AS DOUBLE) AS prec
      |FROM g LEFT JOIN r ON r.source = g.source AND r.rn = g.best_rank
      |ORDER BY g.source""".stripMargin

  /** Neyman-optimal eval-budget allocation across sources: 200 eval
    * slots split ∝ N_h·σ_h of doc length — the variance-minimizing
    * stratified design, derived exactly (integer moments, IEEE sqrt,
    * ordered-fold normalizer, half-up grid). Feeds q69's stratified
    * sampler. See [[graft.operators.Splits.neymanAllocation]]. */
  private def q216(s: SparkSession, d: String): DataFrame =
    Splits.neymanAllocation(
        t(s, d, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars", nTotal = 200L)
      .select(col("source"), col("n_h"), col("sigma"), col("alloc"))
      .orderBy(col("source"))

  private val q216Sql =
    """WITH st AS (SELECT source, COUNT(*) AS n_h,
      |    CAST(SUM(n_chars) AS BIGINT) AS sx,
      |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
      |  FROM documents GROUP BY source),
      |s2 AS (SELECT source, n_h,
      |    sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)
      |         / CAST(n_h * n_h AS DOUBLE)) AS sigma
      |  FROM st),
      |w AS (SELECT source, n_h, sigma, CAST(n_h AS DOUBLE) * sigma AS w FROM s2),
      |z AS (SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b) AS z
      |      FROM w)
      |SELECT source, n_h, sigma,
      |  CAST(floor(CAST(200 AS DOUBLE) * w / (SELECT z FROM z) + 0.5) AS BIGINT)
      |    AS alloc
      |FROM w ORDER BY source""".stripMargin

  /** Declared-vs-detected language confusion — the metadata-trust
    * audit: a feed whose declared `lang` went wrong (mislabeled
    * scrape, wrong default) shows as off-diagonal mass before anyone
    * trains on "English" that isn't. One codegen lang-id projection
    * (q44's operator) + one map-side-combined count; the matrix is
    * |langs|² rows by construction. */
  private def q218(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("lang"), langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  private val q218Sql = {
    def sl(lang: String) =
      StopwordLists.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    val langs = StopwordLists.map(_._1)
    val scores = langs.map(l => s"len(list_intersect(w, ${sl(l)})) AS s_$l").mkString(",\n  ")
    val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString("\n  ")
    s"""WITH w AS (SELECT lang, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
       |           FROM documents),
       |sc AS (SELECT lang,
       |  $scores
       |FROM w),
       |p AS (SELECT lang, CASE WHEN $g = 0 THEN 'und'
       |  $cases
       |  END AS lang_pred
       |FROM sc)
       |SELECT lang, lang_pred, COUNT(*) AS n
       |FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
  }

  /** Dedup survivorship report — the per-source accounting every
    * curation run publishes: of each source's documents, how many fell
    * to exact dedup, how many to near-dup (Jaccard ≥ 0.85 on exact
    * survivors, larger id removed — the first-wins rule), how many
    * survive. One composed DAG of the audited q40 + q41 machinery;
    * the removal ledger columns must sum back to n_docs by
    * construction, so a drop anywhere breaks the hash. */
  private def q219(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("source"), col("text"))
    val keep = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val surv0 = docs.join(keep, Seq("doc_id"), "left_semi")
    val pairs = Dedup.ngramJaccardPairs(surv0, "doc_id", "text",
      n = 3, threshold = 0.85, hashShingles = true)
    val nearRemoved = pairs.select(col("b_id").as("doc_id")).distinct()
    val ex = docs.join(keep, Seq("doc_id"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_exact_removed"))
    val nr = surv0.join(nearRemoved, Seq("doc_id"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_near_removed"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(ex, Seq("source"), "left")
      .join(nr, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_exact_removed"), lit(0L)).as("n_exact_removed"),
        coalesce(col("n_near_removed"), lit(0L)).as("n_near_removed"),
        (col("n_docs") - coalesce(col("n_exact_removed"), lit(0L)) -
          coalesce(col("n_near_removed"), lit(0L))).as("n_survivors"))
      .orderBy(col("source"))
  }

  private val q219Sql =
    """WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
      |surv AS (SELECT d.doc_id, d.source, d.text
      |         FROM documents d JOIN keep USING (doc_id)),
      |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |      FROM surv),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(len(w) - 2),
      |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |       FROM w WHERE len(w) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (SELECT a_id, b_id FROM inter
      |          JOIN sizes sa ON sa.doc_id = a_id
      |          JOIN sizes sb ON sb.doc_id = b_id
      |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.85),
      |nrm AS (SELECT DISTINCT b_id AS doc_id FROM pairs),
      |base AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |ex AS (SELECT source, COUNT(*) AS n_exact_removed FROM documents
      |       WHERE doc_id NOT IN (SELECT doc_id FROM keep) GROUP BY source),
      |nrg AS (SELECT source, COUNT(*) AS n_near_removed
      |        FROM surv JOIN nrm USING (doc_id) GROUP BY source)
      |SELECT b.source, n_docs,
      |  CAST(COALESCE(n_exact_removed, 0) AS BIGINT) AS n_exact_removed,
      |  CAST(COALESCE(n_near_removed, 0) AS BIGINT) AS n_near_removed,
      |  n_docs - CAST(COALESCE(n_exact_removed, 0) AS BIGINT)
      |         - CAST(COALESCE(n_near_removed, 0) AS BIGINT) AS n_survivors
      |FROM base b LEFT JOIN ex USING (source) LEFT JOIN nrg USING (source)
      |ORDER BY source""".stripMargin

  /** PII incidence report — the corpus-level audit OVER q87's per-row
    * machinery: per nation-cohort, how many rows carry each PII kind
    * and the total match counts — the "how contaminated is this feed,
    * and is redaction load balanced" question a privacy review asks
    * before (and after) running the redactor. Same synthesized PII
    * and staged regex semantics as q87 (hash-green there), one
    * map-side-combined roll-up here. */
  private def q221(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PiiFunctions._
    val raw = concat(
      col("c_name"), lit(" <user"), col("c_custkey"), lit("@example.com> ip 10.0."),
      col("c_nationkey"), lit("."), col("c_custkey") % 200, lit(" tel 555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    val counts = piiCounts(raw).map { case (n, c) => c.cast("long").as(n) }
    t(s, d, "customer")
      .select(col("c_nationkey") +: counts: _*)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_emails")).as("total_emails"),
        sum(when(col("n_emails") > 0, 1L).otherwise(0L)).as("rows_with_email"),
        sum(col("n_ips")).as("total_ips"),
        sum(col("n_phones")).as("total_phones"))
      .orderBy(col("c_nationkey"))
  }

  private val q221Sql = {
    import graft.functions.PiiFunctions._
    s"""WITH raw AS (SELECT c_nationkey,
       |  c_name || ' <user' || c_custkey || '@example.com> ip 10.0.' || c_nationkey
       |    || '.' || (c_custkey % 200) || ' tel 555-'
       |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM customer),
       |steps AS (SELECT c_nationkey, t,
       |    regexp_replace(t, '$EmailRe', '<EMAIL>', 'g') AS t1,
       |    regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g') AS t2
       |  FROM raw),
       |cnt AS (SELECT c_nationkey,
       |    len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
       |    len(regexp_extract_all(t1, '$Ipv4Re')) AS n_ips,
       |    len(regexp_extract_all(t2, '$PhoneRe')) AS n_phones
       |  FROM steps)
       |SELECT c_nationkey, COUNT(*) AS n_rows,
       |  CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       |  CAST(SUM(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS rows_with_email,
       |  CAST(SUM(n_ips) AS BIGINT) AS total_ips,
       |  CAST(SUM(n_phones) AS BIGINT) AS total_phones
       |FROM cnt GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  }

  override val queries: Seq[Q] = Seq(
    Q("q40_dedup_exact", q40, Some(q40Sql)),
    Q("q41_dedup_ngram_jaccard", q41, Some(jaccardSql("0.8")), headline = true),
    Q("q42_dedup_minhash_lsh", q42, Some(jaccardSql("0.85")), headline = true),
    Q("q43_dedup_simhash", q43, Some(q43Sql)),
    Q("q44_lang_id", q44, Some(q44Sql)),
    Q("q45_quality_score", q45, Some(q45Sql)),
    Q("q46_token_stats", q46, Some(q46Sql)),
    Q("q47_fingerprint", q47, Some(q47Sql)),
    Q("q48_corpus_stats", q48, Some(q48Sql)),
    Q("q49_pivot_lang", q49, Some(q49Sql)),
    Q("q51_train_split", q51, Some(q51Sql)),
    Q("q69_stratified_sample", q69, Some(q69Sql)),
    Q("q83_decontaminate", q83, Some(q83Sql)),
    Q("q84_repetition_filter", q84, Some(q84Sql)),
    Q("q85_dedup_clusters", q85, Some(q85Sql), headline = true),
    Q("q86_pack_sequences", q86, Some(q86Sql), headline = true),
    Q("q87_pii_redact", q87, Some(q87Sql)),
    Q("q88_chunk_sliding", q88, Some(q88Sql)),
    Q("q90_rarity_score", q90, Some(q90Sql)),
    Q("q92_shuffle_order", q92, Some(q92Sql)),
    Q("q93_dedup_incremental", q93, Some(q93Sql), headline = true),
    Q("q96_lm_surprisal", q96, Some(q96Sql), headline = true),
    Q("q97_domain_mix", q97, Some(q97Sql), headline = true),
    Q("q100_span_dedup", q100, Some(q100Sql), headline = true),
    Q("q101_mixture_resample", q101, Some(q101Sql), headline = true),
    Q("q102_heavy_hitters", q102, Some(q102Sql), headline = true),
    Q("q106_token_budget_mix", q106, Some(q106Sql), headline = true),
    Q("q109_cluster_representative", q109, Some(q109Sql)),
    Q("q110_group_split", q110, Some(q110Sql)),
    Q("q122_pipeline_e2e", q122, Some(q122Sql), headline = true),
    Q("q137_bpe_train", q137, Some(q137Sql)),
    Q("q157_bottomk_sample", q157, Some(q157Sql)),
    Q("q159_inverted_index", q159, Some(q159Sql)),
    Q("q159_build", q159b, Some(q159bSql), headline = true),
    Q("q159_serve", q159s, Some(q159Sql), headline = true),
    Q("q161_inverted_index_sync", q161, Some(q161Sql)),
    Q("q164_pmi_collocations", q164, Some(q164Sql), headline = true),
    Q("q165_containment_dedup", q165, Some(q165Sql)),
    Q("q166_weighted_sample", q166, Some(q166Sql)),
    Q("q169_allpairs_cosine", q169, Some(q169Sql)),
    Q("q170_row_resample", q170, Some(q170Sql)),
    Q("q171_phrase_search", q171, Some(q171Sql)),
    Q("q174_chi_square", q174, Some(q174Sql)),
    Q("q175_gini", q175, Some(q175Sql)),
    Q("q177_feature_hash", q177, Some(q177Sql)),
    Q("q178_countmin", q178, Some(q178Sql)),
    Q("q180_source_overlap", q180, Some(q180Sql)),
    Q("q181_incremental_allpairs", q181, Some(q181Sql)),
    Q("q182_source_drift", q182, Some(q182Sql)),
    Q("q183_audit_pipeline", q183, Some(q183Sql), headline = true),
    Q("q185_ngram_lm", q185, Some(q185Sql)),
    Q("q186_boolean_search", q186, Some(q186Sql)),
    Q("q189_sketch_overlap", q189, Some(q189Sql)),
    Q("q195_neardup_communities", q195, Some(q195Sql)),
    Q("q196_dataset_fingerprint", q196, Some(q196Sql)),
    Q("q199_curriculum_order", q199, Some(q199Sql)),
    Q("q200_ks_drift", q200, Some(q200Sql)),
    Q("q201_rank_auc", q201, Some(q201Sql)),
    Q("q202_record_linkage", q202, Some(q202Sql), headline = true),
    Q("q203_poisson_bootstrap", q203, Some(q203Sql)),
    Q("q206_quantile_normalize", q206, Some(q206Sql)),
    Q("q209_entity_groups", q209, Some(q209Sql), headline = true),
    Q("q210_bpe_apply", q210, Some(q210Sql)),
    Q("q211_group_kfold", q211, Some(q211Sql)),
    Q("q212_temperature_mix", q212, Some(q212Sql)),
    Q("q213_precision_threshold", q213, Some(q213Sql)),
    Q("q216_neyman_allocation", q216, Some(q216Sql)),
    Q("q218_lang_confusion", q218, Some(q218Sql)),
    Q("q219_dedup_survivorship", q219, Some(q219Sql)),
    Q("q221_pii_incidence", q221, Some(q221Sql)))

  /** BPE vocabulary training via [[graft.operators.BpeTrainer]]: 12
    * merges induced from the documents corpus (one corpus pass for the
    * word-frequency table, then vocab-bounded iterations). The merge
    * table IS the output; the oracle replays training verbatim as
    * unrolled CTE steps (pair-count argmax + literal replace per step),
    * so a wrong count, tie-break, or merge application at ANY step
    * changes every later merge and breaks the hash. */
  private def q137(s: SparkSession, d: String): DataFrame = {
    import graft.operators.BpeTrainer
    val words = BpeTrainer.wordFreqs(t(s, d, "documents"), "text")
    val (merges, _) = BpeTrainer.train(words, numMerges = 12)
    import s.implicits._
    merges.toDF("step", "pair").orderBy(col("step"))
  }

  // lazy: declared below the `queries` val, which captures it at init
  private lazy val q137Sql: String = {
    val steps = 12
    val ctes = scala.collection.mutable.ArrayBuffer(
      """words AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w)""".stripMargin,
      """w0 AS MATERIALIZED (SELECT array_to_string(list_transform(range(length(w)), i -> w[i+1]), ' ') AS toks, cnt FROM words)""")
    val sel = scala.collection.mutable.ArrayBuffer.empty[String]
    for (s <- 1 to steps) {
      ctes += s"""p$s AS MATERIALIZED (
        |  SELECT z[1] || ' ' || z[2] AS pr, SUM(cnt) AS c
        |  FROM (SELECT unnest(list_zip(string_split(toks,' '), string_split(toks,' ')[2:])) AS z, cnt FROM w${s - 1})
        |  WHERE z[2] IS NOT NULL GROUP BY 1)""".stripMargin
      ctes += s"b$s AS (SELECT pr FROM p$s ORDER BY c DESC, pr LIMIT 1)"
      // boundary-anchored merge, exactly as BpeTrainer.mergeExpr: pad the
      // word with sentinel spaces, replace ' left right ' -> ' left~right '
      // twice (two passes reach the fixpoint for adjacent runs), trim
      ctes += s"""b${s}x AS (SELECT ' ' || pr || ' ' AS pat, ' ' || replace(pr,' ','~') || ' ' AS rep FROM b$s)"""
      ctes += s"""w$s AS MATERIALIZED (SELECT trim(replace(replace(' ' || toks || ' ',
        |  (SELECT pat FROM b${s}x), (SELECT rep FROM b${s}x)),
        |  (SELECT pat FROM b${s}x), (SELECT rep FROM b${s}x))) AS toks, cnt FROM w${s - 1})""".stripMargin
      sel += s"SELECT $s AS step, (SELECT pr FROM b$s) AS pair"
    }
    "WITH " + ctes.mkString(",\n") + "\n" +
      sel.mkString(" UNION ALL ") + " ORDER BY step"
  }
}
