package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{cosine_sim, l2_dist_sq}

/** Deterministic DataFrame K-Means for IVF centroid training.
  *
  * The reference's IVF index (`numLists`, MongoDbService.cs:144-167) is
  * built server-side; our analog trains centroids with a few Lloyd
  * iterations expressed as Spark plans. Deterministic by construction:
  * init takes the k lowest-id vectors, and each iteration's element-wise
  * means use exact per-position sums (double) over a deterministic
  * groupBy — so the same data yields the same centroids on any cluster
  * layout up to float-sum associativity (assignment flips from that are
  * possible only for points equidistant to centroids; irrelevant to
  * recall).
  */
object SimpleKMeans {

  /** Elementwise vector sum + count per group. The shuffle carries one
    * (dims-double, count) buffer per (centroid, task) instead of the
    * n×dims rows a posexplode/groupBy form shuffles — at 100 TB the
    * difference between "k small arrays per task" and "re-shuffling the
    * corpus once per Lloyd iteration". */
  private class VecSumAgg extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Float], (Array[Double], Long), (Seq[Double], Long)] {
    override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
      val s = if (b._1.length == 0) new Array[Double](a.length) else b._1
      var i = 0; while (i < a.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
      if (x._1.length == 0) y
      else if (y._1.length == 0) x
      else {
        var i = 0; while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    override def finish(r: (Array[Double], Long)): (Seq[Double], Long) = (r._1.toSeq, r._2)
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long)]()
  }

  /** Train k centroids. Keeps the data distributed; only k×dims
    * aggregates ever reach the driver per iteration.
    *
    * `maxTrainPoints` > 0 trains on a deterministic pseudo-random sample
    * of that many vectors (ordered by the engine's seeded Knuth key of
    * the id — same sample on any cluster layout, and replayable by ANY
    * engine, r12: was xxhash64) instead of the full corpus: standard IVF
    * practice (k-means needs ~10²-10³ points per centroid to place
    * lists well; scanning 100 TB per Lloyd iteration buys nothing), and
    * the sample is pinned with a lazy localCheckpoint so iterations
    * re-scan the sample, never the corpus. 0 = train on everything. */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int = 5,
          maxTrainPoints: Int = 0): Array[Array[Float]] = {
    val sampleKey = pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) *
      2654435761L, lit(4294967296L))
    // Bounded sample + integral ids = the DRIVER-LOCAL Lloyd path: the
    // sample is ≤ maxTrainPoints by construction, so iterating over it
    // in memory replaces (1 checkpoint + 1 init collect + iters ×
    // (assign + UDAF shuffle + collect)) Spark jobs with ONE TakeOrdered
    // collect — the r17 q103 root cause was exactly this per-iteration
    // job overhead (k-means over 2000 vectors costing ~1.4 s of
    // scheduling). Numerically it replays the same recipe — k-lowest-id
    // init, index-order double cosine folds, mean-then-spherical-
    // normalize with per-iteration float32 rounding — so the unrolled
    // SQL oracle replays (q33/q103) stay green: the float32 rounding
    // absorbs sub-ULP summation-order differences exactly as it already
    // does between Spark's and DuckDB's fold orders.
    val idIsIntegral = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (maxTrainPoints > 0 && idIsIntegral)
      return fitLocal(
        df.select(col(idCol).cast("long"), col(vecCol))
          .orderBy(sampleKey, col(idCol)).limit(maxTrainPoints)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)),
        k, iters)
    val dataP =
      if (maxTrainPoints <= 0) None
      else Some(graft.operators.Pinned.checkpoint(
        df.select(col(idCol), col(vecCol))
          .orderBy(sampleKey, col(idCol))
          .limit(maxTrainPoints)))
    val data = dataP.map(_.df).getOrElse(df)
    try {
    var centroids: Array[Array[Float]] = data
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)

    val vsum = udaf(new VecSumAgg)
    for (_ <- 1 to iters) {
      val assigned = assign(data, vecCol, centroids)
      val sums = assigned
        .groupBy(col("centroid_id"))
        .agg(vsum(col(vecCol)).as("sn"))
        .collect()
      val next = Array.tabulate(k)(i => centroids(i).map(_.toDouble))
      sums.foreach { r =>
        val c = r.getInt(0)
        val sn = r.getStruct(1)
        val s = sn.getSeq[Double](0); val n = sn.getLong(1)
        var p = 0
        while (p < s.length) { next(c)(p) = s(p) / n; p += 1 }
      }
      // spherical k-means: the search metric is cosine (ref index
      // `similarity: COS`), so centroids live on the unit sphere too
      centroids = next.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        if (n == 0.0) c.map(_.toFloat) else c.map(x => (x / n).toFloat)
      }
    }
    centroids
    // centroids are driver arrays — the pinned training sample must not
    // outlive the fit (Pinned release discipline)
    } finally dataP.foreach(_.release())
  }

  /** Driver-local Lloyd over a collected bounded sample — the SAME
    * arithmetic as the distributed path, step for step: init = k
    * lowest-id sample vectors; assignment = first-max argmax of the
    * index-order double cosine fold ([[graft.functions.VectorExpressions]]
    * CosineSimilarity's exact loop); update = double mean over the
    * assigned vectors (sample order), spherical-normalized, rounded to
    * float32 per iteration; empty clusters keep their previous centroid. */
  private def fitLocal(sample: Array[(Long, Array[Float])], k: Int,
                       iters: Int): Array[Array[Float]] = {
    var centroids: Array[Array[Float]] =
      sample.sortBy(_._1).take(k).map(_._2)
    def cos(x: Array[Float], c: Array[Float]): Double = {
      val n = math.min(x.length, c.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = x(i).toDouble; val yv = c(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Double](k, if (sample.isEmpty) 0 else sample.head._2.length)
      val counts = new Array[Long](k)
      sample.foreach { case (_, v) =>
        // first-max argmax — array_position(sims, array_max(sims)) ties
        // to the LOWEST centroid index, i.e. strictly-greater scan
        var best = 0; var bestSim = cos(v, centroids(0)); var c = 1
        while (c < centroids.length) {
          val s = cos(v, centroids(c))
          if (s > bestSim) { best = c; bestSim = s }
          c += 1
        }
        val acc = sums(best); var p = 0
        while (p < v.length && p < acc.length) { acc(p) += v(p); p += 1 }
        counts(best) += 1
      }
      // exactly the distributed update: start from the previous
      // centroids as doubles, overwrite the clusters that received
      // points with their double means, then spherical-normalize EVERY
      // row (an empty cluster's previous centroid goes through the same
      // double→normalize→float32 round-trip it does distributedly)
      val next = Array.tabulate(k)(i => centroids(i).map(_.toDouble))
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var p = 0
          while (p < next(c).length) { next(c)(p) = sums(c)(p) / counts(c); p += 1 }
        }
        c += 1
      }
      centroids = next.map { m =>
        val n = math.sqrt(m.map(x => x * x).sum)
        if (n == 0.0) m.map(_.toFloat) else m.map(x => (x / n).toFloat)
      }
    }
    centroids
  }

  /** Append `centroid_id` = argmax cosine to the broadcast centroid
    * literals (matches the search metric). k is small (reference default
    * numLists=2), so the argmax is an unrolled expression tree — stays
    * inside whole-stage codegen. */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Float]]): DataFrame = {
    val sims = array(centroids.map(c => cosine_sim(col(vecCol), typedlit(c))): _*)
    df.withColumn("centroid_id",
      (array_position(sims, array_max(sims)) - 1).cast("int"))
  }
}

/** IVF (inverted-file) vector index: corpus partitioned by nearest
  * centroid; probes scan only the `nprobe` nearest lists (partition
  * pruning — the 100-TB path where brute force is O(n·d) per probe).
  * Analog of MongoDbService.cs:144-167 (`kind: vector-ivf`).
  *
  * `multiAssign` > 1 replicates each vector into its m nearest lists
  * (soft assignment): storage ×m buys recall on weakly-clustered data —
  * the TESTDATA embeddings are near-uniform on the sphere, where hard
  * IVF recall is capped at ~the scan fraction. Searches over a
  * multi-assigned index dedup candidates by id before the top-k. */
final case class IvfIndex(centroids: Array[Array[Float]], multiAssign: Int = 1) {

  def numLists: Int = centroids.length

  /** Corpus + centroid_id (one row per assigned list). */
  def assign(df: DataFrame, vecCol: String): DataFrame =
    if (multiAssign <= 1) SimpleKMeans.assign(df, vecCol, centroids)
    else {
      val k = centroids.length
      val sims = array(centroids.map(c => cosine_sim(col(vecCol), typedlit(c))): _*)
      val zipped = zip_with(sims, sequence(lit(0), lit(k - 1)),
        (s, i) => struct(s.as("s"), i.as("i")))
      val sorted = array_sort(zipped, (a, b) =>
        when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
          .otherwise(a("i") - b("i")).cast("int"))
      df.withColumn("centroid_id",
        explode(transform(slice(sorted, 1, multiAssign), x => x("i"))))
    }

  /** Materialize the index: corpus + centroid_id, written partitioned by
    * centroid_id so searches prune whole directories at plan time. Also
    * writes the [[IvfIndex.Sidecar]] so [[graft.search.IvfTopKRewrite]]
    * can recover the centroids from the bare path. */
  def write(df: DataFrame, vecCol: String, path: String): Unit = {
    assign(df, vecCol)
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    IvfIndex.writeSidecar(df.sparkSession, path, this)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Centroid lists nearest to the probe, by cosine (matches the search
    * metric, not the training metric — standard IVF practice). */
  def nearestLists(probe: Array[Float], nprobe: Int): Seq[Int] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    centroids.zipWithIndex
      .map { case (c, i) => (cos(probe, c), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nprobe)
      .map(_._2)
      .toSeq
  }

  /** ANN search: prune to nprobe lists, exact top-k within. On a
    * partitioned index table the `isin` filter becomes partition pruning
    * (zero IO for unprobed lists). Multi-assigned indexes dedup candidate
    * ids first (a candidate may live in several probed lists). */
  def search(indexed: DataFrame, vecCol: String, idCol: String,
             probe: Array[Float], k: Int, nprobe: Int = 1): DataFrame = {
    val lists = nearestLists(probe, nprobe)
    val pruned = indexed.filter(col("centroid_id").isin(lists: _*))
    val cand = if (multiAssign <= 1) pruned else pruned.dropDuplicates(idCol)
    VectorSearch.exactTopK(cand, vecCol, idCol, probe, k)
  }

  /** Batched multi-probe ANN: each probe pairs only with its nprobe
    * nearest centroid lists, so the join fans out probes×(corpus/numLists
    * ×nprobe) rows — vs the probes×corpus cross product of the brute
    * force [[VectorSearch.knnJoinAgg]]. The probe→list assignment is an
    * expression over the broadcast centroid literals (no driver loop per
    * probe), the probe side broadcasts, and the bounded-heap partial
    * aggregate keeps the shuffle at partitions×probes×k rows. With
    * nprobe = numLists and multiAssign = 1 the result equals the exact
    * multi-probe join (spec-asserted).
    *
    * `pred` serves the production batch shape "top-k PER probe WHERE
    * <metadata predicate>" (per-tenant RAG): the predicate filters the
    * indexed rows BELOW the probe join — it pushes to the index scan,
    * composes with the nprobe partition pruning, and the per-probe
    * k-heap never sees excluded rows. Post-filtering a k-sized answer
    * would starve selective predicates below k; this never does. */
  def searchMany(indexed: DataFrame, vecCol: String, idCol: String,
                 probes: DataFrame, probeIdCol: String, probeVecCol: String,
                 k: Int, nprobe: Int = 1,
                 pred: Option[Column] = None): DataFrame = {
    // the output contract names columns (probe_id, idCol, sim, rn) and the
    // probe vector travels as __pvec through the join — corpus columns
    // with those names would be silently clobbered or made ambiguous
    val reserved = Seq("probe_id", "sim", "rn", "__pvec")
    require(!reserved.exists(indexed.columns.contains),
      s"corpus columns may not be named any of ${reserved.mkString(", ")}")
    val nc = centroids.length
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).as("__pvec"))
    val sims = array(centroids.map(c => cosine_sim(col("__pvec"), typedlit(c))): _*)
    val zipped = zip_with(sims, sequence(lit(0), lit(nc - 1)),
      (s, i) => struct(s.as("s"), i.as("i")))
    val sorted = array_sort(zipped, (a, b) =>
      when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
        .otherwise(a("i") - b("i")).cast("int"))
    val plists = p0.withColumn("centroid_id",
      explode(transform(slice(sorted, 1, math.min(nprobe, nc)), x => x("i"))))

    val base = pred.map(indexed.filter).getOrElse(indexed)
    val cand0 = base.join(broadcast(plists), "centroid_id")
    val cand = if (multiAssign <= 1) cand0
               else cand0.dropDuplicates("probe_id", idCol)
    val topk = udaf(new VectorSearch.TopKAgg(k))
    cand
      .withColumn("sim", cosine_sim(col(vecCol), col("__pvec")))
      .groupBy(col("probe_id"))
      .agg(topk(col(idCol).cast("long"), col("sim")).as("hits"))
      .select(col("probe_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("probe_id"), col("hit._1").as(idCol), col("hit._2").as("sim"),
        (col("pos") + 1).as("rn"))
  }
}

object IvfIndex {
  /** Train an IVF index over a corpus (the reference's index-build V3).
    * Centroids train on a deterministic sample of `trainPointsPerList ×
    * numLists` vectors (the faiss-style rule of thumb): at corpus sizes
    * below the cap this is exact full-data training; at 100 TB it is
    * what keeps index build cost independent of corpus size. */
  def train(df: DataFrame, vecCol: String, idCol: String,
            numLists: Int, iters: Int = 5, multiAssign: Int = 1,
            trainPointsPerList: Int = 256): IvfIndex =
    IvfIndex(SimpleKMeans.fit(df, vecCol, idCol, numLists, iters,
      maxTrainPoints = math.max(0, trainPointsPerList) * numLists), multiAssign)

  /** Index metadata persisted next to the data (plain text, not JSON, so
    * no parser dependency): line 1 = multiAssign, then one
    * comma-separated centroid per line. Written/read through the Hadoop
    * FS API so any storage the index lives on works. */
  val SidecarFile = "_ivf_sidecar"

  def writeSidecar(spark: SparkSession, path: String, idx: IvfIndex): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try {
      val body = (idx.multiAssign.toString +:
        idx.centroids.toSeq.map(_.mkString(","))).mkString("\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  def readSidecar(spark: SparkSession, path: String): Option[IvfIndex] = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
        Some(IvfIndex(
          lines.tail.map(_.split(",").map(_.toFloat)).toArray,
          lines.head.trim.toInt))
      } finally in.close()
    }
  }
}
