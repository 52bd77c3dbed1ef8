package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.Transformer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.vector_to_array

import graft.schema.Transactions

/** The batch training entry point — SURVEY §3.1 (`FD/model.py:76-205`)
  * as one lazy Spark job graph:
  *
  *   raw → preprocess (P1,F1-F4,P4,P5) → feature pipeline fit (M1,M3)
  *       → balance (M4) → split (M5) → 3 classifiers (M6-M8)
  *       → metric battery (A9,A11-A16) → persist model + metrics (M11,S8,S9)
  *
  * Scale stance: every stage is a DataFrame transform; the only driver
  * actions are the class-count lookups and final model selection. The
  * same fitted `PipelineModel` serves the streaming scorer, closing the
  * train/serve skew the reference had (SURVEY §2.9.1).
  */
object TrainingJob {

  case class Artifacts(features: PipelineModel,
                       models: Map[String, Transformer],
                       metrics: DataFrame,
                       production: Transformer)

  /** Train end-to-end from raw wire-format transactions.
    *
    * `trueSmote=true` swaps the jittered-oversample balancer for the
    * full kNN-interpolating SMOTE (graft.ml.Smote), applied — like the
    * reference (`FD/model.py:103` before `:110`) — on the encoded,
    * pre-scaling feature matrix; the scaler is then fitted on the
    * resampled data.
    */
  def run(raw: DataFrame, outDir: Option[String] = None,
          fast: Boolean = false, trueSmote: Boolean = false): Artifacts = {
    val pre = FeaturePipeline.preprocess(raw)
      .withColumn("label", col("Is_Fraud").cast("int"))

    // class-presence guard (P9, FD/model.py:99-100)
    val classes = pre.groupBy("label").count().count()
    require(classes >= 2, "training data must contain both classes")

    val (featureModel, weighted, smoteHandle) =
      if (!trueSmote) {
        val fm = FeaturePipeline.fit(pre)
        val featured = fm.transform(FeaturePipeline.withRequiredFeatures(pre))
        val balanced = Balance.oversampleBalanced(featured, "label",
          jitterCols = Nil) // vectors already assembled; jitter is pre-assembly
        (fm, Balance.withBalancedWeights(balanced, "label"),
          Option.empty[graft.ops.Cached])
      } else {
        val pre2 = FeaturePipeline.withRequiredFeatures(pre)
        // fit stages separately so SMOTE can run between encode and scale
        val indexerModel = new org.apache.spark.ml.feature.StringIndexer()
          .setInputCols(Transactions.categoricalFeatures.toArray)
          .setOutputCols(Transactions.categoricalFeatures
            .map(FeaturePipeline.idx).toArray)
          .setStringOrderType("alphabetAsc").setHandleInvalid("keep")
          .fit(pre2)
        val indexed = indexerModel.transform(pre2)
        val sm = Smote.oversampleCached(indexed, "label",
          FeaturePipeline.assemblerInputs.toSeq)
        val assembler = new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(FeaturePipeline.assemblerInputs)
          .setOutputCol("features_raw").setHandleInvalid("keep")
        val assembled = assembler.transform(sm.df)
        val scalerModel = new org.apache.spark.ml.feature.StandardScaler()
          .setInputCol("features_raw").setOutputCol("features")
          .setWithMean(true).setWithStd(true)
          .fit(assembled)
        // re-wrap the fitted stages as one serveable PipelineModel
        val fm = new org.apache.spark.ml.Pipeline()
          .setStages(Array(indexerModel, assembler, scalerModel)).fit(pre2)
        (fm, Balance.withBalancedWeights(
          scalerModel.transform(assembled), "label"), Some(sm))
      }

    // three estimators iterate over the same split: materialize once
    // instead of re-deriving the generator→features→balance plan per
    // fit — eagerly, because trainAll fits concurrently and a lazy
    // cache's first use would race
    val (trainRaw, testRaw) = Models.split(weighted)
    val train = trainRaw.cache(); val test = testRaw.cache()
    train.count()
    val (models, metrics) = Models.trainAll(train, test, fast = fast)
    // everything downstream is materialized (fitted models + the
    // checkpointed metrics frame): release the split caches and the
    // SMOTE minority frames instead of leaking them into the session
    train.unpersist(blocking = false)
    test.unpersist(blocking = false)
    smoteHandle.foreach(_.release())

    // M11: the reference hard-codes XGBoost as production
    // (FD/model.py:190-192) even though RF scores higher — reproduced.
    val production = models("XGBoost")

    outDir.foreach { dir =>
      featureModel.write.overwrite().save(s"$dir/feature_pipeline")
      Models.save(production, s"$dir/fraud_detection_model")
      // S9: metrics JSON sink
      metrics.coalesce(1).write.mode("overwrite").json(s"$dir/model_metrics")
    }
    Artifacts(featureModel, models, metrics, production)
  }

  /** Serve-side loader (S8): feature pipeline + production model. */
  def load(spark: SparkSession, dir: String): (PipelineModel, Transformer) = {
    val features = PipelineModel.load(s"$dir/feature_pipeline")
    val model = org.apache.spark.ml.classification.GBTClassificationModel
      .load(s"$dir/fraud_detection_model")
    (features, model)
  }

  /** Score raw wire-format records with persisted artifacts — the
    * consumer's per-record path (§3.2) as a set-oriented transform,
    * reusable verbatim on a streaming DataFrame.
    */
  def score(raw: DataFrame, features: PipelineModel,
            model: Transformer): DataFrame = {
    val pre = servePreprocess(raw)
    val featured = features.transform(FeaturePipeline.withRequiredFeatures(pre))
    model.transform(featured)
      .withColumn("fraud_probability",
        element_at(vector_to_array(col("probability")), 2))
      .withColumn("prediction_label",
        when(col("prediction") === 1.0, "FRAUD").otherwise("VALID"))
  }

  /** Streaming-safe preprocess: the same feature derivation as
    * `FeaturePipeline.preprocess` minus dropDuplicates (a global
    * aggregate — not applicable per-batch; the reference consumer never
    * deduped the stream either, `FD/consumer.py:40-68`) and minus the
    * PII drop: the display sink needs Transaction_ID/Customer_ID
    * (`FD/consumer.py:134-150`), and the assembler selects features by
    * name, so extra columns simply ride along.
    */
  def servePreprocess(df: DataFrame): DataFrame = {
    val withTs = df.withColumn("__ts",
      graft.ops.TimeFeatures.combinedTimestamp(col("Transaction_Date"),
        col("Transaction_Time")))
    // components before the fill — same ordering rationale as
    // FeaturePipeline.preprocess (null ts → zeros, not NaN features)
    val withComponents =
      graft.ops.TimeFeatures.withTimeComponents(withTs, col("__ts"))
    graft.ops.Cleaning.fillNumericNulls(withComponents).drop("__ts")
  }
}
