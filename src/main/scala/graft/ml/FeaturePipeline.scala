package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Cleaning, TimeFeatures}
import graft.schema.Transactions

/** Train/serve-consistent feature engineering — SURVEY §2.5 M1/M3 + §3.1.
  *
  * The reference's serving bug (`FD/consumer.py:63-66`: a fresh
  * LabelEncoder fit per record, collapsing every categorical to 0) is
  * deliberately NOT reproduced — the indexers are fitted once at train
  * time and persisted inside the PipelineModel, which is the intended
  * "categorical encoding consistent between train and serve" capability
  * (SURVEY §2.9.1).
  *
  * Encoding parity: `StringIndexer(stringOrderType = "alphabetAsc")`
  * assigns codes by sorted value — exactly sklearn `LabelEncoder`'s
  * sorted-classes contract (`FD/model.py:63-67`). `handleInvalid=keep`
  * maps unseen serve-time values to an explicit extra bucket instead of
  * failing mid-stream.
  *
  * Scaling: MLlib `StandardScaler` uses the sample std (ddof=1) where
  * sklearn uses population std (ddof=0); the difference is a
  * `sqrt((n-1)/n)` factor per feature — immaterial for the tree models
  * and a constant rescaling for LR. Documented divergence.
  */
object FeaturePipeline {

  /** §3.1 preprocess_data (`FD/model.py:31-74`): drop PII, combine
    * date+time → timestamp, dedup, fill nulls, extract time components.
    */
  def preprocess(df: DataFrame): DataFrame = {
    val dropped = Cleaning.dropColumns(df, Transactions.droppedColumns)
    val withTs = dropped.withColumn("__ts",
      TimeFeatures.combinedTimestamp(col("Transaction_Date"),
        col("Transaction_Time")))
    val deduped = Cleaning.dropDuplicates(withTs)
    // components BEFORE the null fill: a row with an unparseable
    // timestamp gets year..second = null → filled to 0, instead of
    // nulls surviving past the fill into NaN features that poison the
    // scaler fit
    val withComponents = TimeFeatures.withTimeComponents(deduped, col("__ts"))
    Cleaning.fillNumericNulls(withComponents).drop("__ts")
  }

  /** Indexed column name for a categorical feature. */
  def idx(c: String): String = s"${c}_idx"

  /** Assembler inputs: FEATURE_ORDER with categoricals swapped for their
    * indexed columns — position (the reference's hard contract,
    * `FD/features.py:2-18`) is preserved.
    */
  val assemblerInputs: Array[String] = Transactions.featureOrder.map { c =>
    if (Transactions.categoricalFeatures.contains(c)) idx(c) else c
  }.toArray

  /** The full M1 → P2/P3 → M3 pipeline: indexers → assembler → scaler. */
  def build(withScaler: Boolean = true): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCols(Transactions.categoricalFeatures.toArray)
      .setOutputCols(Transactions.categoricalFeatures.map(idx).toArray)
      .setStringOrderType("alphabetAsc")
      .setHandleInvalid("keep")
    val assembler = new VectorAssembler()
      .setInputCols(assemblerInputs)
      .setOutputCol("features_raw")
      .setHandleInvalid("keep")
    val stages: Array[org.apache.spark.ml.PipelineStage] =
      if (withScaler) {
        val scaler = new StandardScaler()
          .setInputCol("features_raw").setOutputCol("features")
          .setWithMean(true).setWithStd(true)
        Array(indexer, assembler, scaler)
      } else Array(indexer, assembler)
    new Pipeline().setStages(stages)
  }

  /** P3 guard before assembly: any feature missing from the frame is
    * injected as constant 0 (`FD/model.py:70-72`).
    */
  def withRequiredFeatures(df: DataFrame): DataFrame =
    Cleaning.injectMissing(df, Transactions.featureOrder)

  def fit(df: DataFrame, withScaler: Boolean = true): PipelineModel =
    build(withScaler).fit(withRequiredFeatures(df))
}
