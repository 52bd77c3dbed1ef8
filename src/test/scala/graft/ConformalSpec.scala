package graft

import org.apache.spark.sql.functions._

import graft.ops.Conformal

/** Split-conformal audit — rank formula, saturation, and the
  * distribution-free coverage guarantee on exchangeable data.
  */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("coverage holds near 1 - alpha on exchangeable labels") {
    // deterministic pseudo-random p in (0,1) per id; label = the
    // Bernoulli draw from an independent hash — model and labels agree
    // in distribution, so coverage must concentrate near 90%
    val n = 20000
    val df = spark.range(n.toLong).toDF("id")
      .withColumn("proba",
        round((pmod(xxhash64(col("id"), lit(1L)), lit(1000L))
          .cast("double") + 0.5) / 1000.0, 7))
      .withColumn("label",
        (pmod(xxhash64(col("id"), lit(2L)), lit(1000L)).cast("double")
          < col("proba") * 1000.0).cast("int"))
    val out = Conformal.splitConformalAudit(df, "label", "proba", "id")
      .first()
    val cov = out.getAs[Long]("n_covered").toDouble /
      out.getAs[Long]("n_test")
    assert(cov > 0.88 && cov < 0.93, s"coverage $cov")
    // set sizes partition the serving half
    assert(out.getAs[Long]("n_set0") + out.getAs[Long]("n_set1") +
      out.getAs[Long]("n_set2") == out.getAs[Long]("n_test"))
  }

  test("rank k follows the ceil((n+1)(1-alpha)) formula") {
    // n_cal is data-dependent via the hash split, so check the
    // arithmetic relation on whatever split came out
    val df = spark.range(500L).toDF("id")
      .withColumn("proba", round(lit(0.25) + col("id") / 1000.0, 7))
      .withColumn("label", (col("id") % 2 === 0).cast("int"))
    val out = Conformal.splitConformalAudit(df, "label", "proba", "id",
      alphaNum = 2, alphaDen = 10).first()
    val (ncal, k) = (out.getAs[Long]("n_cal"), out.getAs[Long]("k"))
    assert(k == ((ncal + 1) * 8 + 9) / 10, s"n_cal=$ncal k=$k")
  }

  test("tiny calibration saturates q7 to the grid max (infinite set)") {
    // alpha 1/100 with a handful of rows: k > n_cal, so every serving
    // row gets the everything-set and coverage is total
    val df = spark.range(20L).toDF("id")
      .withColumn("proba", round(col("id") / 20.0, 7))
      .withColumn("label", lit(1))
    val out = Conformal.splitConformalAudit(df, "label", "proba", "id",
      alphaNum = 1, alphaDen = 100).first()
    assert(out.getAs[Long]("q7") == 10000000L)
    assert(out.getAs[Long]("n_set2") == out.getAs[Long]("n_test"))
    assert(out.getAs[Long]("n_covered") == out.getAs[Long]("n_test"))
  }

  test("a sharper model yields smaller prediction sets at equal alpha") {
    val n = 10000
    def frame(sharp: Boolean) = {
      val raw = spark.range(n.toLong).toDF("id")
        .withColumn("u",
          (pmod(xxhash64(col("id"), lit(1L)), lit(1000L))
            .cast("double") + 0.5) / 1000.0)
      val p = if (sharp) when(col("u") < 0.5, col("u") * 0.1)
        .otherwise(lit(1.0) - (lit(1.0) - col("u")) * 0.1)
      else col("u")
      raw.withColumn("proba", round(p, 7))
        .withColumn("label",
          (pmod(xxhash64(col("id"), lit(2L)), lit(1000L)).cast("double")
            < col("proba") * 1000.0).cast("int")).drop("u")
    }
    def avgSet(df: org.apache.spark.sql.DataFrame): Double = {
      val r = Conformal.splitConformalAudit(df, "label", "proba", "id")
        .first()
      (r.getAs[Long]("n_set1") + 2.0 * r.getAs[Long]("n_set2")) /
        r.getAs[Long]("n_test")
    }
    assert(avgSet(frame(sharp = true)) < avgSet(frame(sharp = false)),
      "sharper probabilities should shrink conformal sets")
  }
}
