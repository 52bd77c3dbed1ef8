package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Class-imbalance handling — SURVEY §2.5 M4 (SMOTE) and the weight
  * formulas behind M6-M8.
  *
  * Distributed stance: no driver-side materialization. Oversampling is
  * an `explode(array_repeat(...))` per minority row — purely row-local,
  * no shuffle — so it scales to any input size. The only action is one
  * tiny `groupBy(label).count()` to learn the imbalance.
  */
object Balance {

  /** sklearn `class_weight='balanced'` as a per-row weight column:
    * w(y) = n / (k · n_y) (`FD/model.py:117-118`). One count pass, then
    * a literal map — the weights broadcast with the plan.
    */
  def withBalancedWeights(df: DataFrame, labelCol: String,
                          weightCol: String = "weight"): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val k = counts.size
    val weightExpr = counts.foldLeft(lit(1.0)) { case (acc, (label, cnt)) =>
      when(col(labelCol) === label, lit(n / (k * cnt))).otherwise(acc)
    }
    df.withColumn(weightCol, weightExpr)
  }

  /** XGBoost's `scale_pos_weight` = n_neg / n_pos (`FD/model.py:119`). */
  def scalePosWeight(df: DataFrame, labelCol: String): Double = {
    val counts = df.groupBy(col(labelCol)).count()
      .collect().map(r => r.getAs[Number](0).intValue -> r.getLong(1)).toMap
    counts.getOrElse(0, 0L).toDouble / math.max(1L, counts.getOrElse(1, 0L))
  }

  /** SMOTE-lite (M4 semantics-lite per SURVEY §7.3): oversample every
    * non-majority class to the majority count by replicating rows —
    * integer part via `array_repeat`, fractional part via a seeded
    * Bernoulli — with optional uniform jitter on numeric feature columns
    * so replicas are not exact duplicates (the "synthetic" in SMOTE).
    * Unlike imblearn's kNN interpolation this jitters independently per
    * row, which preserves the class-balance contract (`FD/model.py:102-104`)
    * without a kNN join; a true LSH-kNN interpolating Estimator is the
    * documented upgrade path.
    */
  def oversampleBalanced(df: DataFrame, labelCol: String,
                         jitterCols: Seq[String] = Nil,
                         jitterFrac: Double = 0.01,
                         seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    // P9 guard: groupBy counts are always > 0, so the meaningful check
    // is the number of DISTINCT classes
    require(counts.size >= 2,
      s"both classes must be present (${counts.size} seen)")
    val majority = counts.values.max

    val ratioExpr = counts.foldLeft(lit(1.0)) { case (acc, (label, cnt)) =>
      when(col(labelCol) === label, lit(majority.toDouble / cnt)).otherwise(acc)
    }
    // replicate floor(ratio) times + 1 more with prob frac(ratio)
    val replicated = df
      .withColumn("__ratio", ratioExpr)
      .withColumn("__copies",
        (floor(col("__ratio")) +
          (rand(seed) < (col("__ratio") - floor(col("__ratio")))).cast("int"))
          .cast("int"))
      .withColumn("__rep", explode(expr("sequence(1, __copies)")))

    // jitter replicas (not originals) on the numeric features
    val jittered = jitterCols.zipWithIndex.foldLeft(replicated) {
      case (d, (c, i)) =>
        d.withColumn(c,
          when(col("__rep") === 1, col(c)) // keep the original row intact
            .otherwise(col(c) * (lit(1.0) +
              (rand(seed + 100 + i) * 2 - 1) * jitterFrac)))
    }
    jittered.drop("__ratio", "__copies", "__rep")
  }
}
