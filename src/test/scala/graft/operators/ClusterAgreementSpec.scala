package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ClusterAgreementSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("ariNmi: identical partitions score 1/1; relabeling is free") {
    val df = (1 to 60).map(i => (s"c${i % 4}", s"k${(i % 4) * 7}"))
      .toDF("a", "b") // b is a renamed copy of a
    val r = ClusterAgreement.ariNmi(df, "a", "b").head()
    assert(r.getAs[Double]("ari") == 1.0)
    assert(r.getAs[Double]("nmi") == 1.0)
  }

  test("ariNmi: the fully-crossed 2x2 case is hand-computable") {
    // A = {x,x,y,y}, B = {x,y,x,y}: sumIj = 0, E = 2/3,
    // ARI = -2/3 / (2 - 2/3) = -0.5; MI = 0 -> NMI = 0
    val df = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    val r = ClusterAgreement.ariNmi(df, "a", "b").head()
    assert(r.getAs[Double]("ari") == -0.5)
    assert(r.getAs[Double]("nmi") == 0.0)
    assert(r.getAs[Long]("cells_a") == 2L && r.getAs[Long]("cells_b") == 2L)
  }

  test("ariNmi: independent partitions read ~0; partitioning-invariant") {
    val rnd = new scala.util.Random(71)
    val df = (1 to 2000).map(_ =>
      (s"a${rnd.nextInt(5)}", s"b${rnd.nextInt(7)}")).toDF("a", "b")
    val r = ClusterAgreement.ariNmi(df, "a", "b").head()
    assert(math.abs(r.getAs[Double]("ari")) < 0.05)
    assert(r.getAs[Double]("nmi") < 0.05)
    val p1 = ClusterAgreement.ariNmi(df.coalesce(1), "a", "b")
      .head().toSeq
    val p2 = ClusterAgreement.ariNmi(df.repartition(13), "a", "b")
      .head().toSeq
    assert(p1 == p2)
  }

  test("ariNmi refuses a single-cluster side") {
    val df = (1 to 10).map(i => ("only", s"c${i % 3}")).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      ClusterAgreement.ariNmi(df, "a", "b"))
    assert(e.getMessage.contains("single cluster"))
  }
}
