package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Int8 quantization: per-element round-trip error bounded by scale/2,
  * quantized cosine close to float cosine, recall@10 ≥ 0.9 on the
  * testdata embeddings, and interpreted-vs-codegen agreement. */
class QuantizeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randVec(d: Int): Array[Float] = Array.fill(d)(rnd.nextFloat() * 2 - 1)

  test("round-trip error per element is at most scale/2") {
    val vecs = Seq.tabulate(20)(i => (i.toLong, randVec(64))).toDF("id", "v")
    val rows = vecs.select(col("id"), col("v"),
        vec_quantize_i8(col("v")).as("qv"))
      .select(col("v"), col("qv.scale"),
        vec_dequantize_i8(col("qv.q"), col("qv.scale")).as("dq"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0); val scale = r.getFloat(1); val dq = r.getSeq[Float](2)
      assert(v.length == dq.length)
      v.zip(dq).foreach { case (a, b) => assert(math.abs(a - b) <= scale / 2 + 1e-7) }
    }
  }

  test("quantized cosine tracks float cosine within 0.02 on random vectors") {
    val pairs = Seq.tabulate(50)(i => (i.toLong, randVec(256), randVec(256)))
      .toDF("id", "a", "b")
    val rows = pairs.select(
        graft.functions.VectorFunctions.cosine_sim(col("a"), col("b")).as("f"),
        cosine_sim_i8(vec_quantize_i8(col("a")).getField("q"),
          vec_quantize_i8(col("b")).getField("q")).as("q8"))
      .as[(Double, Double)].collect()
    rows.foreach { case (f, q8) => assert(math.abs(f - q8) < 0.02, s"$f vs $q8") }
  }

  test("zero vector quantizes to scale 0 and cosine 0") {
    val df = Seq((1L, Array.fill(8)(0f), randVec(8))).toDF("id", "z", "v")
    val r = df.select(vec_quantize_i8(col("z")).as("qz"), vec_quantize_i8(col("v")).as("qv"))
      .select(col("qz.scale"), cosine_sim_i8(col("qz.q"), col("qv.q"))).head()
    assert(r.getFloat(0) == 0f && r.getDouble(1) == 0.0)
  }

  test("recall@10 >= 0.9 vs exact float top-k on the sf0.001 embeddings") {
    val e = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings").cache()
    val probe = e.filter(col("vec_id") === 0L).head().getSeq[Float](1).toArray
    val exact = graft.search.VectorSearch.exactTopK(e, "embedding", "vec_id", probe, 10)
      .select("vec_id").as[Long].collect().toSet
    val qz = e.select(col("vec_id"), vec_quantize_i8(col("embedding")).as("qv"))
    val probeQ = qz.filter(col("vec_id") === 0L).select(col("qv.q")).head().getAs[Array[Byte]](0)
    val ann = qz.withColumn("s", cosine_sim_i8(col("qv.q"), lit(probeQ)))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    assert(ann.intersect(exact).size >= 9, s"recall ${ann.intersect(exact).size}/10")
    e.unpersist()
  }

  test("interpreted eval agrees with codegen (sql expr vs column api)") {
    val df = Seq((randVec(32), randVec(32))).toDF("a", "b")
    df.createOrReplaceTempView("qt")
    val viaSql = spark.sql(
      """SELECT cosine_sim_i8(vec_quantize_i8(a).q, vec_quantize_i8(b).q) FROM qt""").head().getDouble(0)
    val viaCol = df.select(cosine_sim_i8(vec_quantize_i8(col("a")).getField("q"),
      vec_quantize_i8(col("b")).getField("q"))).head().getDouble(0)
    assert(viaSql == viaCol)
  }
}
