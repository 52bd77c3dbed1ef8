package graft

import org.apache.spark.sql.functions._

import graft.gen.TransactionGen
import graft.ml.{Smote, TrainingJob}

/** True SMOTE (M4 full semantics) — kNN interpolation, balance contract,
  * and the reference's non-integral-code artifact.
  */
class SmoteSpec extends SparkSpec {
  import spark.implicits._

  // two clustered 2-d classes, 9:2 imbalance
  lazy val toy = (
    (1 to 90).map(i => (i.toDouble % 10, (i / 10).toDouble, 0)) ++
      Seq((100.0, 100.0, 1), (102.0, 103.0, 1), (101.0, 101.0, 1),
        (103.0, 100.5, 1), (100.5, 102.5, 1))
    ).toDF("x", "y", "label")

  test("oversamples minority to (approximately) the majority count") {
    val out = Smote.oversample(toy, "label", Seq("x", "y"), k = 3)
    val counts = out.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 90)
    assert(math.abs(counts(1) - 90L) <= 12, s"minority ${counts(1)}")
  }

  test("synthetic points interpolate within the minority cluster hull") {
    val out = Smote.oversample(toy, "label", Seq("x", "y"), k = 3)
    val bad = out.filter($"label" === 1 &&
      ($"x" < 100.0 || $"x" > 103.0 || $"y" < 100.0 || $"y" > 103.0))
    assert(bad.count() == 0) // interpolation never leaves the hull box
    // and synthetics are not mere clones: some non-original coordinates
    val novel = out.filter($"label" === 1 &&
      !$"x".isin(100.0, 102.0, 101.0, 103.0, 100.5))
    assert(novel.count() > 0)
  }

  test("deterministic for a fixed seed") {
    def run() = Smote.oversample(toy, "label", Seq("x", "y"), k = 3, seed = 7)
      .agg(sum($"x"), sum($"y"), count(lit(1))).collect()(0)
    assert(run() == run())
  }

  test("reproduces the reference's non-integral encoded-category artifact") {
    // integer-coded categorical column: interpolated values go fractional
    val coded = (
      (1 to 60).map(i => (i % 3 * 1.0, i % 7 * 1.0, 0)) ++
        (1 to 8).map(i => (i % 3 * 1.0, 50.0 + i % 5, 1))
      ).toDF("code", "v", "label")
    val out = Smote.oversample(coded, "label", Seq("code", "v"), k = 3)
    val fractional = out.filter($"label" === 1 && $"code" % 1.0 =!= 0.0)
    assert(fractional.count() > 0)
  }

  test("end-to-end training with trueSmote stays accurate and serveable") {
    val raw = TransactionGen.batch(spark, 1200, seed = 42)
    val artifacts = TrainingJob.run(raw, fast = true, trueSmote = true)
    val accs = artifacts.metrics.select("model", "accuracy").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(accs.values.forall(_ > 90), accs.toString)
    // the re-wrapped PipelineModel serves raw records
    val scoredDf = TrainingJob.score(raw.limit(50),
      artifacts.features, artifacts.production)
    assert(scoredDf.count() == 50)
  }

  test("hot LSH bucket stays capped and synthesis still lands in-hull") {
    // plant a pathological bucket: 60 identical minority points (all
    // hash to the same (table, bucket)) vs a 300-row majority. With the
    // candidate pool capped the equi-join is 60 x cap, not 60^2, and
    // every synthetic row still interpolates between identical points
    // (i.e. stays exactly on them)
    val hot = (
      (1 to 300).map(i => (i.toDouble % 20, (i / 20).toDouble, 0)) ++
        (1 to 60).map(_ => (50.0, 50.0, 1))
      ).toDF("x", "y", "label")
    val out = Smote.oversample(hot, "label", Seq("x", "y"), k = 3,
      maxBucketCandidates = 8)
    val minority = out.filter($"label" === 1)
    assert(math.abs(minority.count() - 300L) <= 25)
    // identical sources + identical neighbors => synthetics sit on the point
    assert(minority.filter($"x" =!= 50.0 || $"y" =!= 50.0).count() == 0)
  }
}
