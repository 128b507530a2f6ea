package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** The grid-bound refusals (VERDICT r15 finding 1): every operator that
  * closes with a driver-side re-emit of a "grid-bounded" result must
  * refuse LOUDLY when a continuous column turns the grid corpus-sized,
  * instead of checkpointing the corpus and OOMing the collect. */
class GridBoundSpec extends AnyFunSuite with SparkSuite {

  private val over = Grids.DefaultMaxRows + 1000 // 66_536 distinct keys

  test("collectBounded refuses past the cap without collecting the corpus") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Grids.collectBounded(spark.range(over.toLong).toDF("id"), "test grid")
    }
    assert(e.getMessage.contains("test grid"))
    // within the cap it is a plain local re-emit, rows intact
    val ok = Grids.collectBounded(
      spark.range(5).toDF("id").orderBy(col("id")), "small grid")
    assert(ok.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("confusion: continuous truth column refuses at the census") {
    val df = spark.range(over.toLong)
      .select(col("id").as("truth"), (col("id") % 3).as("pred"))
    val e = intercept[IllegalArgumentException] {
      Confusion.multiclass(df, "truth", "pred")
    }
    assert(e.getMessage.contains("census"))
  }

  test("confusion: continuous pred column refuses at the census") {
    val df = spark.range(over.toLong)
      .select((col("id") % 3).as("truth"), col("id").as("pred"))
    val e = intercept[IllegalArgumentException] {
      Confusion.multiclass(df, "truth", "pred")
    }
    assert(e.getMessage.contains("census"))
  }

  test("logRank: continuous duration grid refuses at the re-emit") {
    val df = spark.range(over.toLong)
      .select(col("id").as("t"), lit(true).as("e"), (col("id") % 2).as("g"))
    val e = intercept[IllegalArgumentException] {
      Survival.logRank(df, "t", "e", "g")
    }
    assert(e.getMessage.contains("duration grid"))
  }

  test("fano / zeroInflation: corpus-sized group grid refuses") {
    val df = spark.range(2L * over)
      .select((col("id") % over).as("g"), (col("id") / over).as("p"))
    val e1 = intercept[IllegalArgumentException] {
      Dispersion.fano(df, "g", "p")
    }
    assert(e1.getMessage.contains("group grid"))
    val e2 = intercept[IllegalArgumentException] {
      Dispersion.zeroInflation(df, "g", "p")
    }
    assert(e2.getMessage.contains("group grid"))
  }

  test("transitionEntropy: corpus-sized state alphabet refuses") {
    val df = spark.range(over.toLong)
      .select(lit(1).as("k"), col("id").as("seq"), col("id").as("state"))
    val e = intercept[IllegalArgumentException] {
      Sequences.transitionEntropy(df, Seq("k"), Seq("seq"), "state")
    }
    assert(e.getMessage.contains("state grid"))
  }

  test("cmh: continuous stratum column refuses") {
    // stratum g holds rows g (arm 0) and g+over (arm 1); y = id%3==0
    // mixes outcomes within enough strata to clear the variance require
    val df = spark.range(2L * over)
      .select((col("id") % over).as("s"),
        (col("id") >= over).cast("int").as("arm"),
        (col("id") % 3 === 0).as("y"))
    val e = intercept[IllegalArgumentException] {
      Experiments.cmh(df, "s", "arm", "y")
    }
    assert(e.getMessage.contains("strata grid"))
  }

  test("levene: continuous group column refuses") {
    // group g holds rows g, g+over, g+2·over with three distinct values
    // (over % 7 == 1), so within-group |x−mean| deviations vary — a
    // 2-row group would have structurally zero within-deviation
    val df = spark.range(3L * over)
      .select((col("id") % over).as("g"),
        (col("id") % 7).cast("long").as("v"))
    val e = intercept[IllegalArgumentException] {
      Variance.levene(df, "g", "v")
    }
    assert(e.getMessage.contains("group grid"))
  }

  test("retention: corpus-sized cohort-week grid refuses") {
    // triangular activity: user u is active weeks u..399, so the
    // (cohort, offset) grid has 400·401/2 = 80_200 rows > the cap
    val weeks = 400
    val df = spark.range(weeks.toLong * weeks)
      .select(floor(col("id") / weeks).cast("long").as("u"),
        (col("id") % weeks).as("w"))
      .filter(col("w") >= col("u"))
      .select(col("u").as("user"),
        date_add(lit("2024-01-01"), (col("w") * 7).cast("int")).as("ts"))
    val e = intercept[IllegalArgumentException] {
      Cohorts.retention(df, "user", "ts", "2024-01-01")
    }
    assert(e.getMessage.contains("cohort-week grid"))
  }

  test("brierDecomposition: absurd bin count refuses up front") {
    val df = spark.range(10)
      .select((col("id") / 10.0).as("s"), (col("id") % 2 === 0).as("y"))
    val e = intercept[IllegalArgumentException] {
      Calibration.brierDecomposition(df, "s", "y", bins = 1 << 20)
    }
    assert(e.getMessage.contains("bins"))
  }
}
