package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1 form):
  * cut embedding width d → k with pairwise distances preserved to
  * 1 ± ε whp — the byte-budget lever BEFORE any ANN index (a 64→16
  * projection shrinks every downstream LSH/IVF/HNSW structure 4× and
  * distorts neighbors by ~ sqrt(ln n / k); compose with
  * [[graft.search.LshIndex]] et al. rather than competing with them).
  *
  * The sign matrix is not sampled: sign(i,j) = parity of a fixed
  * integer polynomial mod 1e9+7 — deterministic, seedable, and
  * computable by ANY engine in plain BIGINT arithmetic (the same
  * cross-engine-hash trick as the q70/q110 gates; Spark's xxhash64 has
  * no DuckDB twin, a polynomial does). JL only needs the rows to be
  * near-orthogonal in aggregate, which the spec checks empirically via
  * pairwise-distance distortion.
  *
  * Two faces, the [[Pooling]] precedent: [[projectGrid]] is the exact
  * integer gate face (inputs floored to a 2^-gridBits grid, projection
  * = Σ ±grid — pure associative integer sums, bit-identical
  * everywhere); [[projectFloat]] is the serve face (floats, scaled
  * 1/√k so distances are directly comparable). Both are single narrow
  * projections — nested HOF lambdas inside whole-stage codegen, no
  * UDFs, no shuffle.
  */
object RandomProjection {

  /** ±1 as a Column: parity of (i·2654435761 + j·1013904223 +
    * i·j·2246822519 + seed) mod 1e9+7; i, j are lambda variables. The
    * multipliers are large enough that the polynomial WRAPS the modulus
    * even for single-digit i, j — without the wrap, mod-p is the
    * identity on small inputs and the parity degenerates to the
    * structured `ij+1 mod 2` (measured: distance distortion blows
    * past the JL band; see RandomProjectionSpec). */
  private def sign(i: Column, j: Column, seed: Int): Column = {
    val p = (i * 2654435761L + j * 1013904223L + i * j * 2246822519L +
      lit(seed.toLong)) % 1000000007L
    when(p % 2 === 0, lit(1L)).otherwise(lit(-1L))
  }

  /** Exact integer projection of `vecCol` (array<float|double>, width
    * inDims) to `outDims` longs on the 2^-gridBits grid. */
  def projectGrid(df: DataFrame, vecCol: String, inDims: Int, outDims: Int,
                  outCol: String = "proj", seed: Int = 7,
                  gridBits: Int = 14): DataFrame = {
    require(inDims > 0 && outDims > 0 && outDims <= inDims,
      s"bad dims $inDims->$outDims")
    val scale = 1L << gridBits
    val g = transform(col(vecCol), x => floor(x.cast("double") * lit(scale)).cast("long"))
    df.withColumn(outCol,
      transform(sequence(lit(0L), lit(outDims - 1L)), j =>
        aggregate(
          zip_with(g, sequence(lit(0L), lit(inDims - 1L)), (x, i) => sign(i, j, seed) * x),
          lit(0L), (acc, v) => acc + v)))
  }

  /** Serve-face float projection, scaled 1/√outDims (distance-
    * comparable: E‖proj(a)−proj(b)‖² = ‖a−b‖²). */
  def projectFloat(df: DataFrame, vecCol: String, inDims: Int, outDims: Int,
                   outCol: String = "proj", seed: Int = 7): DataFrame = {
    val norm = 1.0 / math.sqrt(outDims.toDouble)
    df.withColumn(outCol,
      transform(sequence(lit(0L), lit(outDims - 1L)), j =>
        (aggregate(
          zip_with(col(vecCol), sequence(lit(0L), lit(inDims - 1L)),
            (x, i) => sign(i, j, seed).cast("double") * x.cast("double")),
          lit(0.0), (acc, v) => acc + v) * lit(norm)).cast("float")))
  }
}
