package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{cosine_sim, l2_norm, pq_adc_dot}

/** Product-quantization (PQ) vector index — the extreme-compression ANN
  * path (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; the faiss `IndexPQ`/`IndexIVFPQ` family).
  *
  * The vector is split into `m` subspaces of `dsub` dims; each subspace
  * is quantized to one of `ks ≤ 256` learned centroids, so a 1536-d
  * float vector (6 KB) becomes `m` bytes of codes + one stored norm —
  * at m=96 a 64× compression. That factor, not speed alone, is the
  * 100 TB story: the coded corpus fits executor memory where floats
  * cannot, and the scan kernel ([[graft.functions.PqAdcDot]]) is m
  * table lookups per candidate instead of dims multiplies.
  *
  * Division of labor (same shape as the reference's server-side index
  * build, MongoDbService.cs:144-167, re-expressed for Spark):
  *  - TRAIN on the driver over a bounded deterministic sample (k-means
  *    per subspace wants ~10²-10³ points per centroid; training cost
  *    must not track corpus size — same rationale as
  *    [[SimpleKMeans.fit]]'s sample cap);
  *  - ENCODE distributed (one narrow pass over the corpus with the
  *    codebook broadcast in the UDF closure — the ingest-time step);
  *  - SEARCH distributed: ADC scan → shortlist top-`shortlist` by
  *    approximate score (a per-task k-heap, `TakeOrderedAndProject`) →
  *    EXACT cosine rerank of the shortlist only (the standard
  *    PQ-then-refine serve pipeline; recall is set by the shortlist
  *    size, tail latency by the coded scan).
  *
  * Determinism: the training sample is xxhash64-ordered, subspace
  * k-means init takes the sample's first `ks` subvectors, and Lloyd
  * runs sequentially on the driver — same data ⇒ same codebook, on any
  * cluster layout.
  */
final case class PqCodebook(dsub: Int, centroids: Array[Array[Array[Float]]]) {
  def m: Int = centroids.length
  def ks: Int = centroids.head.length
  def dims: Int = m * dsub

  /** Flattened per-query lookup table: lut[s*ks + j] = dot(query_sub_s,
    * centroid_sj). Computed once per probe on the driver (m×ks×dsub
    * flops), broadcast as a literal into the scan. */
  def lookupTable(query: Array[Float]): Array[Float] = {
    require(query.length == dims, s"query dims ${query.length} != codebook dims $dims")
    val lut = new Array[Float](m * ks)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ks) {
        val c = centroids(s)(j)
        var dot = 0.0; var i = 0
        while (i < dsub) { dot += query(s * dsub + i).toDouble * c(i); i += 1 }
        lut(s * ks + j) = dot.toFloat
        j += 1
      }
      s += 1
    }
    lut
  }

  /** Centroids flattened (m × ks × dsub row-major) — the layout
    * [[graft.functions.PqEncode]] indexes in generated code. */
  def flat: Array[Float] = {
    val out = new Array[Float](m * ks * dsub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ks) {
        System.arraycopy(centroids(s)(j), 0, out, (s * ks + j) * dsub, dsub)
        j += 1
      }
      s += 1
    }
    out
  }

  /** Nearest-centroid code per subspace (L2 in the subspace — the PQ
    * training metric; ties break to the lower code, matching train). */
  def encodeOne(v: Array[Float]): Array[Byte] = {
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        val c = centroids(s)(j)
        var d = 0.0; var i = 0
        while (i < dsub) {
          val t = v(s * dsub + i).toDouble - c(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    codes
  }
}

/** IVF + PQ composition — the production 100 TB serve topology (the
  * faiss `IndexIVFPQ` family): centroid partitioning prunes which index
  * segments are READ at all, PQ codes shrink what the survivors scan
  * (m bytes + a norm per vector — the float corpus never enters the
  * index table), and the exact rerank against the float corpus restores
  * precision for the final k. Each knob owns one axis: `nprobe` trades
  * IO for recall, `shortlist` trades rerank cost for recall, `m`/`ks`
  * trade index size for ADC fidelity.
  */
final class IvfPq(val ivf: IvfIndex, val cb: PqCodebook,
                  store: graft.store.DocumentStore, table: String,
                  vecCol: String, idCol: String) {

  /** Materialize the coded index: (id, codes, norm) partitioned by
    * centroid — floats deliberately excluded. */
  def build(df: DataFrame): Unit = {
    val coded = ivf.assign(PqIndex.encode(cb, df, vecCol), vecCol)
      .select(col(idCol), col("pq_codes"), col("norm"), col("centroid_id"))
    store.create(table, coded, partitionCol = Some("centroid_id"))
  }

  /** Prune → ADC-scan → shortlist → exact rerank. `corpus` supplies the
    * float vectors for the ≤`shortlist` rerank lookups only.
    * `allowedIds` (filtered search) semi-joins the coded candidates
    * BEFORE the shortlist, so a selective metadata predicate cannot
    * crowd the shortlist with rows the caller will discard. */
  def search(corpus: DataFrame, probe: Array[Float], k: Int,
             nprobe: Int = 4, shortlist: Int = 100,
             allowedIds: Option[DataFrame] = None): DataFrame = {
    val lists = ivf.nearestLists(probe, nprobe).map(_.toString)
    val pruned0 = store.readPartitions(table, lists)
    val pruned1 = if (ivf.multiAssign <= 1) pruned0 else pruned0.dropDuplicates(idCol)
    val pruned = allowedIds
      .map(a => pruned1.join(a.select(col(idCol)), Seq(idCol), "left_semi"))
      .getOrElse(pruned1)
    val lut = cb.lookupTable(probe)
    var qn = 0.0; var i = 0
    while (i < probe.length) { qn += probe(i).toDouble * probe(i); i += 1 }
    val ids = pruned
      .withColumn("adc_sim",
        graft.functions.VectorFunctions.pq_adc_dot(col("pq_codes"), typedlit(lut))
          / (col("norm") * lit(math.sqrt(qn))))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(shortlist)
      .select(col(idCol))
    VectorSearch.exactTopK(
      corpus.join(broadcast(ids), Seq(idCol), "left_semi"),
      vecCol, idCol, probe, k)
  }

  /** Where this index's sidecars live (the coded table's directory). */
  def servePath: String = store.tablePath(table)

  /** The persisted measured operating point, if the index was tuned. */
  def servePoint: Option[ServePoint] =
    ServePoint.read(store.spark, servePath)

  /** Distinct coded vectors (multiAssign replicates rows; the serve
    * heuristic needs the corpus cardinality, not the replica count). */
  lazy val codedCount: Long =
    store.read(table).select(col(idCol)).distinct().count()

  /** Measure the minimal (nprobe, shortlist) reaching `target` mean
    * recall@k, and PERSIST it beside the coded table — the build-time
    * step that makes [[IvfPqSearcher]]'s defaults data-driven instead
    * of pinned (the r12 sf1 finding: constants tuned at one corpus
    * size fail the recall gate at 10×).
    *
    * The probe sample is SPLIT: candidates walk against the tune half
    * and a satisfying candidate must then clear the target on the
    * HELD-OUT half too (measured necessity, not caution: the first sf1
    * run of the plain walk picked (4, 320) at 0.9125 on its own probes
    * and served 0.84 on fresh ones — a minimal point with no
    * validation is overfit to its probe set by construction). The
    * persisted recall is the held-out one.
    *
    * The held-out acceptance carries a NOISE GUARD: mean recall@k over
    * n probes has stderr ≈ √(t(1−t)/(n·k)), so a point that clears the
    * bare target can still serve fresh probes below it (measured: the
    * first guard-less sf1 run accepted (8, 320) at held-out 0.9125 and
    * a third probe set read 0.86). Acceptance is
    * target + 2·√(target(1−target)/(holdN·k)) — the minimal point
    * whose measurement is distinguishable from sub-target, not the
    * minimal point that got lucky.
    *
    * Walk order is cost-ascending per knob: shortlists grow
    * geometrically from the 4k floor toward the corpus (rerank cost),
    * and within each shortlist nprobe doubles toward numLists (scan
    * IO). Fails loudly with the measured curve when even (numLists,
    * corpus-scale shortlist) misses — a silently sub-target serve
    * default is a wrong answer, not a tuning result (the
    * [[RecallTuner]] contract).
    *
    * Cost envelope: probes are ≤ 2·`nProbeVecs` (collected — bounded);
    * truth is one batched exact scan (probes × corpus, map-side
    * k-heaps); each candidate evaluation reads ≤ nprobe/numLists of
    * the coded table + `shortlist` float point-lookups. */
  def tuneServe(corpus: DataFrame, k: Int = 10, target: Double = 0.9,
                nProbeVecs: Int = 16): ServePoint = {
    val spark = store.spark
    val n = corpus.count()
    // the engine's any-engine-reproducible sample key (PqIndex.train)
    val sampleKey = pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) *
      2654435761L, lit(4294967296L))
    val probes = corpus.select(col(idCol), col(vecCol))
      .orderBy(sampleKey, col(idCol)).limit(2 * nProbeVecs)
    val truthP = graft.operators.Pinned.checkpoint(
      VectorSearch.knnJoinWindow(probes, idCol, vecCol,
          corpus, idCol, vecCol, k)
        .select(col("probe_id"), col(idCol)))
    val truth = truthP.df
    try {
    val all = probes.collect().map(r => r.get(0) -> r.getSeq[Float](1).toArray)
    // position-parity split: both halves come from the same Knuth order,
    // so the split is deterministic and label-blind
    val (tunePvs, holdPvs) = all.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (t, h) => (t.map(_._1), h.map(_._1))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col(idCol))
    def recallOf(pvs: Array[(Any, Array[Float])], np: Int, sl: Int): Double = {
      val results = pvs.map { case (pid, pv) =>
        search(corpus, pv, k, np, sl)
          .select(lit(pid).as("probe_id"), col(idCol), col("sim"))
      }.reduce(_ unionByName _).withColumn("rn", row_number().over(w))
      // truth restricted to THIS half's probes: meanRecall scores probes
      // missing from results as 0, so the full 2n-probe truth would cap
      // each half at 0.5 by construction
      val half = truth.filter(col("probe_id").isin(pvs.map(_._1): _*))
      RecallTuner.meanRecall(results, half, k, docCol = idCol)
    }
    val numLists = ivf.centroids.length
    val nprobes = (Iterator.iterate(1)(_ * 2).takeWhile(_ < numLists).toSeq
      :+ numLists).distinct
    val slFloor = 4 * k
    val shortlists = (Iterator.iterate(slFloor.toLong)(_ * 2)
      .takeWhile(_ < n).toSeq :+ n).map(_.min(Int.MaxValue.toLong).toInt).distinct
    // 2σ noise guard on the held-out mean (see doc): a bare-target
    // acceptance at this sample size is within measurement noise of
    // sub-target serving
    val guard = 2.0 * math.sqrt(target * (1 - target) / (holdPvs.length * k))
    val measured = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    for (sl <- shortlists; np <- nprobes) {
      val rec = recallOf(tunePvs, np, sl)
      measured += ((np, sl, rec))
      if (rec >= target) {
        val held = recallOf(holdPvs, np, sl)
        measured += ((np, sl, held))
        if (held >= target + guard) {
          val sp = ServePoint(np, sl, k, target, held, n)
          ServePoint.write(spark, servePath, sp)
          return sp
        }
      }
    }
    throw new IllegalStateException(
      f"no (nprobe, shortlist) reaches recall@$k >= $target%.2f + " +
        f"noise guard $guard%.3f on held-out probes; measured: " +
        measured.map { case (np, sl, r) =>
          s"($np,$sl)->${"%.4f".format(r)}" }.mkString(", "))
    } finally truthP.release() // result is a driver ServePoint
  }
}

object PqIndex {

  /** Train a PQ codebook on a deterministic sample of the corpus.
    * `maxTrainPoints` bounds what reaches the driver (vectors × dims
    * floats — 2048 × 1536 ≈ 12 MB); per-subspace Lloyd then runs
    * locally. Empty clusters keep their previous centroid.
    *
    * The sample order is the engine's seeded Knuth key (r12: was
    * xxhash64, which only Spark can compute — the Knuth stack is the
    * house ANY-engine-reproducible hash, which is what lets the q95
    * oracle replay the init selection relationally). Init takes the
    * first `ks` subvectors in that order, so the order IS part of the
    * trained artifact's definition. */
  def train(df: DataFrame, vecCol: String, idCol: String,
            m: Int, ks: Int, iters: Int = 5,
            maxTrainPoints: Int = 2048): PqCodebook = {
    val sampleKey = pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) *
      2654435761L, lit(4294967296L))
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(sampleKey, col(idCol))
      .limit(maxTrainPoints)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "PQ training needs at least one vector")
    val dims = sample.head.length
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    val kk = math.min(ks, sample.length)

    val centroids = Array.tabulate(m) { s =>
      // init: the sample's first kk subvectors of this subspace
      val cents = Array.tabulate(kk)(j => {
        val c = new Array[Float](dsub)
        System.arraycopy(sample(j), s * dsub, c, 0, dsub); c
      })
      var it = 0
      val assignBuf = new Array[Int](sample.length)
      while (it < iters) {
        // assign
        var p = 0
        while (p < sample.length) {
          val v = sample(p)
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < kk) {
            var d = 0.0; var i = 0
            while (i < dsub) {
              val t = v(s * dsub + i).toDouble - cents(j)(i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          assignBuf(p) = best
          p += 1
        }
        // update
        val sums = Array.fill(kk)(new Array[Double](dsub))
        val ns = new Array[Long](kk)
        p = 0
        while (p < sample.length) {
          val j = assignBuf(p); val v = sample(p)
          var i = 0
          while (i < dsub) { sums(j)(i) += v(s * dsub + i); i += 1 }
          ns(j) += 1
          p += 1
        }
        var j = 0
        while (j < kk) {
          if (ns(j) > 0) {
            var i = 0
            while (i < dsub) { cents(j)(i) = (sums(j)(i) / ns(j)).toFloat; i += 1 }
          }
          j += 1
        }
        it += 1
      }
      cents
    }
    PqCodebook(dsub, centroids)
  }

  /** Encode the corpus: `(…, pq_codes BINARY, norm DOUBLE)`. The exact
    * norm rides along (8 bytes) so cosine needs no second pass. Both
    * columns are codegen Catalyst expressions ([[graft.functions.PqEncode]]
    * / [[graft.functions.L2Norm]]) so the one pass that touches every
    * float of the corpus stays inside whole-stage codegen — no ScalaUDF
    * boxing a dims-element Seq per row (PqSpec asserts the plan is
    * UDF-free and bit-parity with `PqCodebook.encodeOne`). */
  def encode(cb: PqCodebook, df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("pq_codes",
        graft.functions.VectorFunctions.pq_encode(col(vecCol), cb.flat, cb.m, cb.ks, cb.dsub))
      .withColumn("norm", l2_norm(col(vecCol)))

  /** ADC scan + exact rerank. `encoded` carries (idCol, pq_codes, norm);
    * `corpus` is the float-vector source used ONLY for the shortlist
    * rerank (broadcast semi-join on the shortlist ids — point lookups,
    * never a corpus scan). Returns exact-cosine top-k of the shortlist,
    * ordered (sim desc, id) like [[VectorSearch.exactTopK]]. */
  def searchRerank(cb: PqCodebook, encoded: DataFrame,
                   corpus: DataFrame, vecCol: String, idCol: String,
                   probe: Array[Float], k: Int, shortlist: Int): DataFrame = {
    val lut = cb.lookupTable(probe)
    var qn = 0.0; var i = 0
    while (i < probe.length) { qn += probe(i).toDouble * probe(i); i += 1 }
    val qnorm = math.sqrt(qn)
    val approx = encoded
      .withColumn("adc_sim",
        pq_adc_dot(col("pq_codes"), typedlit(lut)) / (col("norm") * lit(qnorm)))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(shortlist)
      .select(col(idCol))
    VectorSearch.exactTopK(
      corpus.join(broadcast(approx), Seq(idCol), "left_semi"),
      vecCol, idCol, probe, k)
  }

  /** Flat-PQ analog of [[IvfPq.tuneServe]]: measure the minimal
    * shortlist reaching `target` mean recall@k on a bounded
    * deterministic probe sample vs exact truth. No store here, so the
    * caller persists the returned point (or bakes it into a
    * [[PqSearcher]]). Fails loudly with the measured curve when even a
    * corpus-sized shortlist misses (then the CODEBOOK is the problem —
    * retrain with more subspaces, don't widen the rerank forever). */
  def tuneShortlist(cb: PqCodebook, encoded: DataFrame, corpus: DataFrame,
                    vecCol: String, idCol: String, k: Int = 10,
                    target: Double = 0.9, nProbeVecs: Int = 16): ServePoint = {
    val n = corpus.count()
    val sampleKey = pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) *
      2654435761L, lit(4294967296L))
    val probes = corpus.select(col(idCol), col(vecCol))
      .orderBy(sampleKey, col(idCol)).limit(2 * nProbeVecs)
    val truthP = graft.operators.Pinned.checkpoint(
      VectorSearch.knnJoinWindow(probes, idCol, vecCol,
          corpus, idCol, vecCol, k)
        .select(col("probe_id"), col(idCol)))
    val truth = truthP.df
    try {
    val all = probes.collect().map(r => r.get(0) -> r.getSeq[Float](1).toArray)
    val (tunePvs, holdPvs) = all.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (t, h) => (t.map(_._1), h.map(_._1))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col(idCol))
    def recallOf(pvs: Array[(Any, Array[Float])], sl: Int): Double = {
      val results = pvs.map { case (pid, pv) =>
        searchRerank(cb, encoded, corpus, vecCol, idCol, pv, k, sl)
          .select(lit(pid).as("probe_id"), col(idCol), col("sim"))
      }.reduce(_ unionByName _).withColumn("rn", row_number().over(w))
      val half = truth.filter(col("probe_id").isin(pvs.map(_._1): _*))
      RecallTuner.meanRecall(results, half, k, docCol = idCol)
    }
    val shortlists = (Iterator.iterate((4L * k).max(1L))(_ * 2)
      .takeWhile(_ < n).toSeq :+ n).map(_.min(Int.MaxValue.toLong).toInt).distinct
    val guard = 2.0 * math.sqrt(target * (1 - target) / (holdPvs.length * k))
    val measured = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    shortlists.foreach { sl =>
      val rec = recallOf(tunePvs, sl)
      measured += ((sl, rec))
      if (rec >= target) {
        // held-out + noise guard, as tuneServe
        val held = recallOf(holdPvs, sl)
        measured += ((sl, held))
        if (held >= target + guard) return ServePoint(1, sl, k, target, held, n)
      }
    }
    throw new IllegalStateException(
      s"no shortlist reaches recall@$k >= $target on held-out probes " +
        "(codebook too coarse); measured: " + measured.map { case (sl, r) =>
          s"$sl->${"%.4f".format(r)}" }.mkString(", "))
    } finally truthP.release() // result is a driver ServePoint
  }

  /** Mean squared reconstruction error of the codebook over a corpus —
    * the PQ analog of [[IvfStore.assignmentQuality]]: quantization
    * error per vector is Σ over subspaces of ||v_s − centroid(code_s)||²
    * (exactly what training minimized), so a drifting corpus shows up
    * as this number climbing and the remedy is the same
    * retrain-and-re-encode. One narrow codegen pass (encode) plus an
    * interpreted reconstruction distance on a BOUNDED deterministic
    * sample — health checks must not cost a full 100 TB decode. */
  def reconstructionError(cb: PqCodebook, df: DataFrame, vecCol: String,
                          idCol: String, sampleSize: Int = 2048): Double = {
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "reconstruction error needs at least one vector")
    var total = 0.0
    sample.foreach { v =>
      val codes = cb.encodeOne(v)
      var s = 0
      while (s < cb.m) {
        val c = cb.centroids(s)(codes(s) & 0xFF)
        var i = 0
        while (i < cb.dsub) {
          val t = v(s * cb.dsub + i).toDouble - c(i)
          total += t * t; i += 1
        }
        s += 1
      }
    }
    total / sample.length
  }

  /** Codebook sidecar (same plain-text scheme as [[IvfIndex]]): line 1 =
    * `dsub`, then one comma-separated centroid per line in (subspace,
    * code) row-major order, ks inferred from the line count ÷ m... ks is
    * written explicitly as line 2 to keep the format self-describing. */
  val SidecarFile = "_pq_sidecar"

  def writeSidecar(spark: SparkSession, path: String, cb: PqCodebook): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try {
      val body = (Seq(cb.dsub.toString, cb.ks.toString) ++
        cb.centroids.iterator.flatMap(_.iterator.map(_.mkString(",")))).mkString("\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  def readSidecar(spark: SparkSession, path: String): Option[PqCodebook] = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
        val dsub = lines(0).trim.toInt
        val ks = lines(1).trim.toInt
        val flat = lines.drop(2).map(_.split(",").map(_.toFloat))
        require(flat.length % ks == 0, s"corrupt PQ sidecar: ${flat.length} rows, ks=$ks")
        Some(PqCodebook(dsub, flat.grouped(ks).map(_.toArray).toArray))
      } finally in.close()
    }
  }
}
