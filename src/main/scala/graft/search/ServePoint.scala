package graft.search

import org.apache.spark.sql.SparkSession

/** A MEASURED ANN serve operating point, persisted beside the index it
  * was measured on — the round-13 answer to the pinned-constant
  * failure: a `(nprobe=4, shortlist=100)` tuned at one corpus size
  * dropped below the 0.9 recall gate at 10× the data (the designed
  * loud failure; PLANS.md r12 sf1 capture). Serve parameters are DATA,
  * not code: they are measured at build time by [[IvfPq.tuneServe]] /
  * [[PqIndex.tuneShortlist]] against exact ground truth on a bounded
  * probe sample, written to the index sidecar, and read back by the
  * [[VectorSearcher]] strategies, so an index always ships the
  * operating point that was verified on ITS corpus.
  *
  * `scaledTo` extrapolates a measured point to a larger corpus: the
  * shortlist grows LINEARLY with N (the measured sf0.1→sf1 rule —
  * 100→800 per 10×; in distribution the number of ADC interlopers
  * ranked above a true neighbor is a fixed per-candidate probability
  * times N, so the required rerank depth tracks N), while `nprobe`
  * carries over (it is a fraction-of-lists knob, already scale-free).
  * Extrapolation never SHRINKS a measured point.
  */
final case class ServePoint(nprobe: Int, shortlist: Int, k: Int,
                            target: Double, recall: Double, corpusN: Long) {
  require(nprobe >= 1 && shortlist >= 1 && k >= 1 && corpusN >= 1,
    s"bad serve point: $this")

  def scaledTo(n: Long): ServePoint =
    if (n <= corpusN) this
    else {
      // ceil(shortlist · n / corpusN); BigInt — shortlist·n can pass 2⁶³
      val sl = (BigInt(shortlist) * n + corpusN - 1) / corpusN
      copy(shortlist = sl.min(Int.MaxValue).toInt, corpusN = n)
    }
}

object ServePoint {

  /** Plain-text sidecar (the [[IvfIndex.SidecarFile]] scheme): one
    * line, space-separated fields. Lives in the index directory so the
    * operating point travels with the artifact it certifies. */
  val SidecarFile = "_serve_sidecar"

  /** UNMEASURED fallback when an index has no persisted operating
    * point: shortlist = max(4k, 100, ⌈N/16⌉). The measured envelope is
    * ~N/25 for recall 0.90 (sf1: 800 of 20 000); /16 adds margin, and
    * the 100 floor keeps tiny-corpus behavior at the previously-pinned
    * constant. This is the honest bound for serving an untuned index —
    * the production path is to tune at build and persist, which lands
    * well below it. */
  def heuristicShortlist(n: Long, k: Int): Int = {
    val byN = (n + 15) / 16
    math.min(math.max(math.max(4L * k, 100L), byN), Int.MaxValue.toLong).toInt
  }

  def write(spark: SparkSession, dir: String, sp: ServePoint): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      s"${sp.nprobe} ${sp.shortlist} ${sp.k} ${sp.target} ${sp.recall} ${sp.corpusN}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): Option[ServePoint] = {
    val p = new org.apache.hadoop.fs.Path(dir, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val f = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.split(" ")
        require(f.length == 6, s"corrupt serve sidecar: ${f.length} fields")
        Some(ServePoint(f(0).toInt, f(1).toInt, f(2).toInt,
          f(3).toDouble, f(4).toDouble, f(5).toLong))
      } finally in.close()
    }
  }
}
