package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class JackknifeSpec extends AnyFunSuite with SparkSuite {

  private def bucketOf(id: Long, g: Int): Int =
    ((((id % 2147483648L) * 2654435761L) % 4294967296L) % g).toInt

  test("matches a brute-force leave-one-bucket-out computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val units = (1L to 500L).map(i =>
      (i, rnd.nextInt(100).toDouble, 1.0 + rnd.nextInt(9)))
    val out = Jackknife.ratio(units.toDF("id", "y", "x"), "id", "y", "x",
      groups = 10).collect()
    assert(out.length == 10)
    // brute force with the same bucket hash
    val byBucket = units.groupBy(u => bucketOf(u._1, 10))
    val sy = byBucket.view.mapValues(_.map(u => BigDecimal(u._2)).sum).toMap
    val sx = byBucket.view.mapValues(_.map(u => BigDecimal(u._3)).sum).toMap
    val ty = sy.values.sum; val tx = sx.values.sum
    val rdel = (0 until 10).map(b =>
      (ty - sy(b)).toDouble / (tx - sx(b)).toDouble)
    val mean = rdel.sum / 10
    val se = math.sqrt(9.0 / 10.0 * rdel.map(r => (r - mean) * (r - mean)).sum)
    out.foreach { r =>
      val b = r.getInt(0)
      assert(math.abs(r.getAs[Double]("r_del") - rdel(b)) < 1e-6, s"b=$b")
      assert(math.abs(r.getAs[Double]("r_hat") - ty.toDouble / tx.toDouble)
        < 1e-6)
      assert(math.abs(r.getAs[Double]("jk_se") - se) < 1e-6)
      assert(r.getAs[Long]("groups") == 10L)
    }
  }

  test("partitioning-invariant (decimal cells)") {
    import spark.implicits._
    val units = (1L to 300L).map(i => (i, (i % 7).toDouble, 1.0))
    val a = Jackknife.ratio(units.toDF("id", "y", "x").coalesce(1),
      "id", "y", "x", 10).collect().map(_.toString).toSeq
    val b = Jackknife.ratio(units.toDF("id", "y", "x").repartition(13),
      "id", "y", "x", 10).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
