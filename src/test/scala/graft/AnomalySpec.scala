package graft

import org.apache.spark.sql.functions._

import graft.ops.Anomaly

/** Mahalanobis outlier screen — joint-distribution semantics the
  * per-feature z-score cannot provide, plus the degenerate guards.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // a tight correlation ridge (y ≈ 10x) with one on-ridge extreme and
  // one off-ridge point that is unremarkable per-axis
  lazy val ridge = ((1 to 40).map(i => ("g", i.toLong, i * 10L + i % 3)) :+
    ("g", 60L, 600L) :+ // extends the ridge: large per-axis, on-trend
    ("g", 10L, 350L) // mid-range per-axis, far off the ridge
    ).toDF("grp", "x", "y")

  test("off-ridge point outscores the on-ridge extreme") {
    val scored = Anomaly.mahalanobis2PerGroup(ridge, "grp", "x", "y")
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        r.getDouble(r.fieldIndex("m2"))).toMap
    assert(scored((10L, 350L)) > scored((60L, 600L)),
      s"off-ridge ${scored((10L, 350L))} vs ridge ${scored((60L, 600L))}")
    // and the off-ridge point clears the chi2(2) 99.9% flag
    assert(scored((10L, 350L)) > 13.8155)
  }

  test("mean m2 equals the dimension (bivariate identity)") {
    // sum of Mahalanobis² over n points under the biased MLE
    // covariance is exactly n·d — a closed-form invariant of the
    // quadratic form, so the per-row scores average to 2
    val m2s = Anomaly.mahalanobis2PerGroup(ridge, "grp", "x", "y")
      .agg(avg(col("m2"))).first().getDouble(0)
    assert(math.abs(m2s - 2.0) < 1e-6, s"mean m2 $m2s")
  }

  test("groups score independently") {
    val two = ridge.union(
      (1 to 30).map(i => ("h", 1000L + i, 5L * i + i % 4))
        .toDF("grp", "x", "y"))
    val byGroup = Anomaly.mahalanobis2PerGroup(two, "grp", "x", "y")
      .groupBy("grp").agg(avg(col("m2")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byGroup("g") - 2.0) < 1e-6)
    assert(math.abs(byGroup("h") - 2.0) < 1e-6)
  }

  test("singular covariance yields null scores, not a crash") {
    // perfectly collinear: det = 0
    val flat = (1 to 10).map(i => ("s", i.toLong, 2L * i))
      .toDF("grp", "x", "y")
    val out = Anomaly.mahalanobis2PerGroup(flat, "grp", "x", "y")
    assert(out.filter(col("m2").isNotNull).count() == 0)
    assert(out.count() == 10)
  }

  test("null feature rows are excluded from stats and output") {
    val withNulls = ridge.union(Seq(("g", null.asInstanceOf[java.lang.Long],
      java.lang.Long.valueOf(5L))).toDF("grp", "x", "y"))
    val out = Anomaly.mahalanobis2PerGroup(withNulls, "grp", "x", "y")
    assert(out.count() == 42) // the null-x row dropped
  }
}
