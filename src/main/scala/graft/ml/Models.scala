package graft.ml

import org.apache.spark.ml.classification.{
  GBTClassifier, LogisticRegression,
  RandomForestClassifier}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.util.MLWritable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.vector_to_array

import graft.ops.Aggregates

/** Classifier zoo + evaluation — SURVEY §2.5 M5-M12.
  *
  * The reference trains three class-balanced models and scores each with
  * the full metric battery (`FD/model.py:116-146`). XGBoost is
  * substituted by MLlib `GBTClassifier` (documented divergence, SURVEY
  * §7.3 — xgboost4j is not available offline); `scale_pos_weight`
  * becomes per-row balanced weights, which is the same reweighting
  * expressed per-example.
  */
object Models {

  /** M5: 80/20 split, seed 42 (`FD/model.py:107`). */
  def split(df: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), seed)
    (train, test)
  }

  /** M6-M8: the three candidates, all consuming the balanced weight
    * column (sklearn `class_weight='balanced'` ≙ weightCol).
    */
  def candidates(featuresCol: String = "features",
                 labelCol: String = "label",
                 weightCol: String = "weight",
                 fast: Boolean = false)
      : Seq[(String, org.apache.spark.ml.Estimator[_])] = Seq(
    "Logistic Regression" -> new LogisticRegression()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setWeightCol(weightCol).setMaxIter(if (fast) 10 else 100),
    // fast mode also caps tree DEPTH: every tree level is a scheduled
    // job, so depth drives wall-clock on small data far more than tree
    // count; the bench task (fraud ≙ amount bands) separates at depth 3-4
    "Random Forest" -> new RandomForestClassifier()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setWeightCol(weightCol).setSeed(42)
      .setNumTrees(if (fast) 8 else 100)
      .setMaxDepth(if (fast) 4 else 5),
    "XGBoost" -> new GBTClassifier() // GBT stands in for xgboost (§7.3)
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setWeightCol(weightCol).setSeed(42)
      .setMaxIter(if (fast) 5 else 50)
      .setMaxDepth(if (fast) 3 else 5)
  )

  /** M9: score a frame → (label, pred, proba=P(class 1)). */
  def scored(model: Transformer, df: DataFrame,
             labelCol: String = "label"): DataFrame =
    model.transform(df).select(
      col(labelCol).cast("int").as("label"),
      col("prediction").cast("int").as("pred"),
      element_at(vector_to_array(col("probability")), 2).as("proba"))

  /** A9/A11-A16 over one scored frame, joined into one metrics row (the
    * model_metrics.json shape, `FD/model.py:135-146`). Materializes
    * eagerly and releases its working caches before returning — the
    * metrics row is tiny, and a lazily-returned plan would pin the full
    * scored frame in the block manager with no release path.
    */
  def evaluate(scoredDf: DataFrame): DataFrame = {
    val s = scoredDf.cache()
    val l = col("label"); val p = col("pred")
    val eps = 1e-15
    val pr = greatest(least(col("proba"), lit(1 - eps)), lit(eps))
    // confusion counts + log loss share one aggregation pass; AUC needs
    // its own (parallel rank plan)
    val base = s.agg(
      sum(when(l === 0 && p === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(l === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(l === 1 && p === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(l === 1 && p === 1, 1L).otherwise(0L)).as("tp"),
      (-avg(when(l === 1, log(pr)).otherwise(log(lit(1) - pr))))
        .as("log_loss"))
    val b = base.cache() // one row; evaluated once, read twice
    val out = graft.ops.Checkpoints.cut(
      Aggregates.binaryMetrics(b)
        .crossJoin(broadcast(b.select("log_loss")))
        .crossJoin(broadcast(Aggregates.rocAuc(s, "label", "proba"))))
    s.unpersist(blocking = false)
    b.unpersist(blocking = false)
    out
  }

  /** The full battery for MANY models in one pass: scored frames tagged
    * with a `model` column and union'd, then every metric stage — the
    * confusion/log-loss aggregation, the derived battery, and the
    * grouped ROC AUC ([[Aggregates.rocAucByGroup]]) — runs grouped by
    * model. Evaluating N models costs one traversal of the union
    * instead of N independent plans (~3× fewer jobs for the m12 shape,
    * which is pure scheduling overhead at small scale and one saved
    * scan per model at large scale). Returns the metrics frame plus the
    * two cached intermediates via [[graft.ops.Cached]] — call
    * `.release()` after consuming the (tiny) metrics frame, as
    * [[trainAll]] does, so repeated evaluations don't accumulate scored
    * frames in the block manager.
    */
  def evaluateAllCached(scoredByModel: DataFrame): graft.ops.Cached = {
    val s = scoredByModel.cache()
    val l = col("label"); val p = col("pred")
    val eps = 1e-15
    val pr = greatest(least(col("proba"), lit(1 - eps)), lit(eps))
    val base = s.groupBy(col("model")).agg(
      sum(when(l === 0 && p === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(l === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(l === 1 && p === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(l === 1 && p === 1, 1L).otherwise(0L)).as("tp"),
      (-avg(when(l === 1, log(pr)).otherwise(log(lit(1) - pr))))
        .as("log_loss"))
    val b = base.cache() // one row per model; evaluated once, read twice
    val metrics = Aggregates.binaryMetrics(b, carryCols = Seq("model"))
      .join(b.select("model", "log_loss"), "model")
      .join(Aggregates.rocAucByGroup(s, "label", "proba", Seq("model")),
        "model")
    graft.ops.Cached(metrics, Seq(s, b))
  }

  /** Convenience form: eagerly materializes the (one-row-per-model)
    * metrics frame and releases the backing caches before returning, so
    * callers can't leak them.
    */
  def evaluateAll(scoredByModel: DataFrame): DataFrame = {
    val r = evaluateAllCached(scoredByModel)
    val out = graft.ops.Checkpoints.cut(r.df)
    r.release()
    out
  }

  /** M12: train/evaluate every candidate; returns fitted models plus a
    * metrics frame with one row per model (one fused evaluation pass —
    * [[evaluateAll]]).
    */
  def trainAll(train: DataFrame, test: DataFrame,
               featuresCol: String = "features", labelCol: String = "label",
               weightCol: String = "weight", fast: Boolean = false)
      : (Map[String, Transformer], DataFrame) = {
    // independent estimators fit CONCURRENTLY (the CrossValidator
    // pattern): each fit is a chain of small driver-blocking jobs, so
    // overlapping them fills the scheduler instead of serializing
    // GBT-behind-RF-behind-LR. The caller's cached train frame must be
    // materialized before the race — concurrent first-use of a lazy
    // cache makes every thread build it.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fitted = candidates(featuresCol, labelCol, weightCol, fast).map {
      case (name, est) =>
        name -> Future(est.fit(train).asInstanceOf[Transformer])
    }.map { case (name, f) => name -> Await.result(f, Duration.Inf) }
    val taggedScores = fitted.map { case (name, model) =>
      scored(model, test, labelCol).withColumn("model", lit(name))
    }.reduce(_ unionByName _)
    (fitted.toMap, evaluateAll(taggedScores))
  }

  /** M10: named feature importances → top-k (A6). Tree models only. */
  def featureImportances(spark: SparkSession, importances: Vector,
                         names: Seq[String], k: Int = 10): DataFrame = {
    import spark.implicits._
    val df = names.zip(importances.toArray).toDF("feature", "importance")
    Aggregates.topK(df, "importance", k, "feature")
  }

  /** M11/S8: persist the chosen production model. */
  def save(model: Transformer, path: String): Unit =
    model.asInstanceOf[MLWritable].write.overwrite().save(path)

  /** Isotonic (PAVA) probability calibration: fit a monotone
    * non-decreasing map raw score → empirical P(y=1) on held-out
    * scores, the standard post-training calibration step when a
    * model's probabilities drift from observed frequencies (Zadrozny &
    * Elkan 2002; pool-adjacent-violators). MLlib's distributed
    * IsotonicRegression does the heavy sort/merge; applying the model
    * is a broadcast piecewise-linear lookup per row.
    *
    * Returns the input with a `calibrated` column appended.
    */
  def isotonicCalibrate(scoredDf: DataFrame, labelCol: String,
                        probaCol: String): DataFrame = {
    val ir = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("__p").setLabelCol("__y")
      .setPredictionCol("calibrated").setIsotonic(true)
    val prepared = scoredDf
      .withColumn("__p", col(probaCol).cast("double"))
      .withColumn("__y", col(labelCol).cast("double"))
    ir.fit(prepared).transform(prepared).drop("__p", "__y")
  }

  /** M9 scoring path as pure column algebra: apply a FIXED logistic
    * model — coefficients as literals — appending `proba` (sigmoid of
    * the linear term, 7dp-rounded: the m15/NaiveBayes cross-engine
    * discipline, one transcendental `exp` absorbed by the rounding)
    * and `pred` (proba ≥ 0.5). This is exactly what serving a trained
    * LR model is (`FD/consumer.py:60-66` scores each event through
    * stored coefficients); training stays MLlib/spec-gated, but the
    * predict+probability semantics get a hash-exact oracle row because
    * every op here is restatable in any engine.
    *
    * The linear term evaluates STRICTLY left-to-right in the given
    * weight order (IEEE double addition is order-sensitive; the oracle
    * must parenthesize identically), features cast to double first.
    */
  def scoreLogistic(df: DataFrame, weights: Seq[(String, Double)],
                    intercept: Double, probaCol: String = "proba",
                    predCol: String = "pred"): DataFrame = {
    require(weights.nonEmpty, "at least one coefficient")
    val z = weights.foldLeft(lit(intercept)) { case (acc, (c, w)) =>
      acc + lit(w) * col(c).cast("double")
    }
    // 7dp (the LogisticIrls margin): a 1-ulp cross-engine exp drift
    // sits ~1e9 below the rounding boundary instead of ~1e7
    // null-feature rows give proba NULL; `pred` must still be 0 (not
    // NULL) to mirror the oracle's CASE WHEN ... THEN 1 ELSE 0
    df.withColumn(probaCol,
        round(lit(1.0) / (lit(1.0) + exp(-z)), 7))
      .withColumn(predCol, when(col(probaCol) >= 0.5, 1).otherwise(0))
  }
}
