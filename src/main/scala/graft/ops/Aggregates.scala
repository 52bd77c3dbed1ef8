package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators — SURVEY §2.4 A1-A18.
  *
  * Everything is a declarative aggregate / window expression: map-side
  * partial aggregation, whole-stage codegen, and AQE all apply untouched.
  * No driver-side loops on data paths — each of these holds at 100 TB
  * because the only shuffles are on the explicit grouping keys.
  */
object Aggregates {

  /** A1/A2: running per-class counters — the consumer's two process
    * globals (`FD/consumer.py:18-20,127-131`) as a grouped count. In
    * streaming this runs in update mode against the state store.
    */
  def classCounters(df: DataFrame, predCol: String): DataFrame =
    df.groupBy(col(predCol)).agg(count(lit(1)).as("cnt"))

  /** A5: most frequent value per group with the pandas `Series.mode()[0]`
    * tie-break (smallest value wins — `FD/evaluation.py:170,172`).
    * Two-phase: count per (group, value) then one row_number window — both
    * shuffle only on the grouping key.
    */
  def modePerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counted = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(groupCol), col(valueCol).as("mode_value"))
  }

  /** A7: last value per key by a monotonic ordinal — the counts.log
    * reverse scan (`FD/dashboard.py:150-163`). `max_by` is a single-pass
    * declarative aggregate: one shuffle on the key, no window needed.
    */
  def lastPerKey(df: DataFrame, keyCol: String, ordCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(
      max_by(col(valueCol), col(ordCol)).as("last_value"),
      max(col(ordCol)).as("last_ord"))

  /** A6: top-k rows by a value column (`FD/model.py:181-183`). Spark plans
    * order+limit as TakeOrderedAndProject — per-partition heap + driver
    * merge of k rows, never a full sort of the data.
    */
  def topK(df: DataFrame, valueCol: String, k: Int, tieBreak: String): DataFrame =
    df.orderBy(col(valueCol).desc, col(tieBreak).asc).limit(k)

  /** A8: tail-N by ordinal (`FD/dashboard.py:24`), returned in display
    * (ascending) order.
    */
  def tailN(df: DataFrame, ordCol: String, n: Int): DataFrame =
    df.orderBy(col(ordCol).desc).limit(n).orderBy(col(ordCol).asc)

  /** A9: confusion counts tn/fp/fn/tp as four conditional sums
    * (`FD/model.py:132-133`) — one row out, single aggregate, no pivot.
    */
  def confusionCounts(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val l = col(labelCol); val p = col(predCol)
    df.agg(
      sum(when(l === 0 && p === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(l === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(l === 1 && p === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(l === 1 && p === 1, 1L).otherwise(0L)).as("tp"))
  }

  /** A11-A14: the reference's scalar metric battery (`FD/model.py:131-146`)
    * computed from the one-row confusion frame — accuracy %, weighted
    * precision/recall/F1 (sklearn `classification_report` weighted avg),
    * specificity, FPR, FNR, Matthews correlation coefficient. All plain
    * arithmetic over A9's four counts; runs on one row.
    */
  def binaryMetrics(confusion: DataFrame): DataFrame = {
    val tn = col("tn").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tp = col("tp").cast("double")
    val n = tn + fp + fn + tp
    val support0 = tn + fp; val support1 = fn + tp
    // per-class precision/recall with sklearn's 0-on-0/0 convention
    def safeDiv(a: Column, b: Column): Column =
      when(b === 0, 0.0).otherwise(a / b)
    val p0 = safeDiv(tn, tn + fn); val p1 = safeDiv(tp, tp + fp)
    val r0 = safeDiv(tn, tn + fp); val r1 = safeDiv(tp, tp + fn)
    val f0 = safeDiv(lit(2) * p0 * r0, p0 + r0)
    val f1 = safeDiv(lit(2) * p1 * r1, p1 + r1)
    val mccDen = sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    confusion.select(
      ((tp + tn) / n * 100).as("accuracy"),
      ((p0 * support0 + p1 * support1) / n).as("precision_weighted"),
      ((r0 * support0 + r1 * support1) / n).as("recall_weighted"),
      ((f0 * support0 + f1 * support1) / n).as("f1_weighted"),
      safeDiv(tn, tn + fp).as("specificity"),
      safeDiv(fp, fp + tn).as("false_positive_rate"),
      safeDiv(fn, fn + tp).as("false_negative_rate"),
      when(mccDen === 0, 0.0)
        .otherwise((tp * tn - fp * fn) / mccDen).as("matthews_corrcoef"))
  }

  /** A15: log loss with sklearn's eps clipping (`FD/model.py:145`). */
  def logLoss(df: DataFrame, labelCol: String, probaCol: String,
              eps: Double = 1e-15): DataFrame = {
    val p = greatest(least(col(probaCol), lit(1 - eps)), lit(eps))
    df.agg((-avg(when(col(labelCol) === 1, log(p)).otherwise(log(lit(1) - p))))
      .as("log_loss"))
  }

  /** A16: ROC AUC via the rank-sum (Mann-Whitney U) identity — exactly
    * `sklearn.roc_auc_score` including tie handling through average ranks.
    * One global sort window + one aggregate; at scale the sort is a range
    * shuffle on proba. Returns null when only one class is present
    * (the reference guards this case, `FD/evaluation.py:148-151`).
    */
  def rocAuc(df: DataFrame, labelCol: String, probaCol: String): DataFrame = {
    // average rank of tied probas = min-rank + (ties-1)/2
    val ranked = df
      .select(col(labelCol).cast("double").as("y"), col(probaCol).as("p"))
      .withColumn("r",
        rank().over(Window.orderBy(col("p"))) +
          (count(lit(1)).over(Window.partitionBy(col("p"))) - 1) / 2.0)
    ranked.agg(
      when(sum(col("y")) === 0 || sum(lit(1) - col("y")) === 0, lit(null))
        .otherwise(
          (sum(when(col("y") === 1, col("r")).otherwise(0.0)) -
            sum(col("y")) * (sum(col("y")) + 1) / 2.0) /
            (sum(col("y")) * sum(lit(1) - col("y")))).as("roc_auc"))
  }

  /** A17: PR-curve optimal threshold (`FD/evaluation.py:91-95,139-140`).
    * Cumulative tp/fp over descending proba, per-threshold precision /
    * recall / F1, NaN rows skipped like numpy's nan-ignoring argmax
    * (SURVEY §2.9.7); tie-break = highest F1 then lowest threshold.
    */
  def optimalThreshold(df: DataFrame, labelCol: String, probaCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    // per-distinct-threshold counts, then cumulative sums ordered desc.
    // Total positives come in via a one-row cross join (broadcast — no
    // driver-side action, stays a single lazy plan).
    val perTh = df.groupBy(col(probaCol).as("th"))
      .agg(sum(y).as("pos"), sum(lit(1) - y).as("neg"))
    val totals = df.agg(sum(y).as("total_pos"))
    val w = Window.orderBy(col("th").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = perTh.crossJoin(broadcast(totals))
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("neg")).over(w))
      .withColumn("precision", col("tp") / (col("tp") + col("fp")))
      .withColumn("recall", col("tp") / col("total_pos"))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(null))
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
    curve.filter(col("f1").isNotNull)
      .orderBy(col("f1").desc, col("th").asc)
      .limit(1)
      .select(col("th").as("optimal_threshold"), col("f1").as("best_f1"))
  }

  /** Sketch aggregates for the 100 TB path: HyperLogLog++ distinct
    * counting and approximate quantiles — the constant-memory stand-ins
    * for exact distinct/percentile when cardinality explodes. (Beyond
    * the reference surface; rows-only gate + tolerance spec since
    * sketch internals differ across engines.)
    */
  def sketchProfile(df: DataFrame, keyCol: String, valueCol: String,
                    rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(keyCol), rsd).as("approx_distinct"),
      countDistinct(col(keyCol)).as("exact_distinct"),
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col(valueCol), lit(0.99), lit(10000)).as("p99"))

  /** A12: accuracy as a single aggregate (`FD/evaluation.py:145`). */
  def accuracy(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.agg((avg((col(labelCol) === col(predCol)).cast("double")) * 100)
      .as("accuracy"))

  /** A18: distinct-class count (`FD/evaluation.py:149`). */
  def distinctClasses(df: DataFrame, labelCol: String): Long =
    df.agg(countDistinct(col(labelCol))).first().getLong(0)
}
