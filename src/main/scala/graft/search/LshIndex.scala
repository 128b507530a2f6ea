package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vec_dot

/** Random-hyperplane (sign) LSH for cosine ANN — the bucket-join scale
  * path alongside brute force and IVF (SURVEY §2.8 V3).
  *
  * Each of `numTables` tables hashes a vector to a `bits`-bit key: bit j
  * is the sign of the dot product with a seeded random hyperplane.
  * Cosine-similar vectors collide with probability (1 - θ/π)^bits per
  * table; `numTables` independent tables drive recall up without
  * widening any single scan.
  *
  * Scale design: keys are plain int columns computed inside whole-stage
  * codegen (an unrolled sum of sign tests over the codegen'd `vec_dot`),
  * so indexing is one narrow projection pass. A search filters the corpus
  * with an OR of per-table key equalities — min/max row-group stats (or a
  * `partitionBy("lsh_k0")` layout) prune most of the corpus — then runs
  * exact top-k on the surviving candidates. No shuffle at any point:
  * probe keys are literals.
  *
  * Determinism: hyperplanes come from `java.util.Random(seed)` whose LCG
  * is specified by the JDK, so the same seed gives the same index on any
  * cluster.
  */
final case class HyperplaneLsh(planes: Array[Array[Array[Float]]]) {

  def numTables: Int = planes.length
  def bits: Int = planes.headOption.map(_.length).getOrElse(0)

  private def keyExpr(vecCol: Column, table: Array[Array[Float]]): Column =
    table.zipWithIndex.map { case (p, j) =>
      when(vec_dot(vecCol, typedlit(p)) >= 0d, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Append one int key column per table: lsh_k0 .. lsh_k{L-1}. */
  def assign(df: DataFrame, vecCol: String): DataFrame =
    planes.zipWithIndex.foldLeft(df) { case (acc, (tbl, i)) =>
      acc.withColumn(s"lsh_k$i", keyExpr(col(vecCol), tbl))
    }

  /** Driver-side key of one probe vector (same math as [[assign]]). */
  def keysOf(probe: Array[Float]): Array[Int] =
    planes.map { tbl =>
      tbl.zipWithIndex.map { case (p, j) =>
        val n = math.min(p.length, probe.length)
        var dot = 0.0; var i = 0
        while (i < n) { dot += p(i).toDouble * probe(i).toDouble; i += 1 }
        if (dot >= 0) 1 << j else 0
      }.sum
    }

  /** All keys within Hamming distance `radius` of `key` (multiprobe
    * expansion — standard practice for sign-LSH: near-misses flip one or
    * two close-to-the-hyperplane bits, so probing adjacent buckets buys
    * recall without more tables). */
  private def expand(key: Int, radius: Int): Seq[Int] = {
    def flips(start: Int, left: Int, acc: Int): Seq[Int] =
      if (left == 0) Seq(acc)
      else (start until bits).flatMap(j => flips(j + 1, left - 1, acc ^ (1 << j)))
    (0 to radius).flatMap(r => flips(0, r, key)).distinct
  }

  /** ANN search over an assigned corpus: candidate = any-table key within
    * `probeRadius` Hamming of the probe's key, then exact top-k among
    * candidates. */
  def search(indexed: DataFrame, vecCol: String, idCol: String,
             probe: Array[Float], k: Int, probeRadius: Int = 2): DataFrame = {
    val keys = keysOf(probe)
    val pred = keys.zipWithIndex
      .map { case (kv, i) => col(s"lsh_k$i").isin(expand(kv, probeRadius): _*) }
      .reduce(_ || _)
    VectorSearch.exactTopK(indexed.filter(pred), vecCol, idCol, probe, k)
  }
}

object HyperplaneLsh {
  /** Seeded deterministic hyperplane bank (standard normal components). */
  def apply(dims: Int, bits: Int, numTables: Int, seed: Long = 42L): HyperplaneLsh = {
    val rnd = new java.util.Random(seed)
    HyperplaneLsh(Array.fill(numTables, bits, dims)(rnd.nextGaussian().toFloat))
  }

  /** Hyperplane-bank sidecar (same plain-text scheme as the IVF/PQ
    * sidecars, Hadoop-FS end to end): header `numTables bits`, then one
    * comma-separated plane per line in (table, bit) row-major order.
    * Persisting the planes (not just a seed) keeps custom banks valid. */
  val SidecarFile = "_lsh_sidecar"

  def writeSidecar(spark: org.apache.spark.sql.SparkSession, path: String,
                   lsh: HyperplaneLsh): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try {
      val body = (s"${lsh.numTables} ${lsh.bits}" +:
        lsh.planes.iterator.flatMap(_.iterator.map(_.mkString(","))).toSeq).mkString("\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  def readSidecar(spark: org.apache.spark.sql.SparkSession,
                  path: String): Option[HyperplaneLsh] = {
    val p = new org.apache.hadoop.fs.Path(path, SidecarFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
        val Array(nt, bits) = lines.head.trim.split(" ").map(_.toInt)
        val flat = lines.tail.map(_.split(",").map(_.toFloat))
        require(flat.length == nt * bits, s"corrupt LSH sidecar: ${flat.length} rows")
        Some(HyperplaneLsh(flat.grouped(bits).map(_.toArray).toArray))
      } finally in.close()
    }
  }
}
