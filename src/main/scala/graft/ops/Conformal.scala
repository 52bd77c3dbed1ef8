package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction (Vovk et al.; Angelopoulos & Bates 2021
  * tutorial form) — distribution-free uncertainty for the serving
  * path. The reference ships bare probabilities
  * (`FD/consumer.py:60-66`); conformal turns them into prediction
  * SETS with a finite-sample coverage guarantee that holds no matter
  * how miscalibrated the model is, as long as calibration and serving
  * rows are exchangeable.
  *
  * Procedure: hash-split rows into calibration/serving halves; on
  * calibration rows the nonconformity score is the inverse
  * probability `1 − p̂(y_true)`; q̂ is the ⌈(n+1)(1−α)⌉-th smallest
  * calibration score; a serving row's prediction set is
  * `{y : 1 − p̂(y) ≤ q̂}` — sometimes both classes (model unsure),
  * sometimes one, occasionally none (α exceeded by both).
  *
  * Engine-exactness: probabilities arrive 7dp-rounded (the
  * [[graft.ml.Models.scoreLogistic]] contract), so scores live on the
  * integer grid `s7 = round(s·10⁷) ∈ [0, 10⁷]` and the whole
  * procedure — split, rank selection, set membership, coverage — is
  * exact integer arithmetic. q̂ saturates to the grid maximum when
  * ⌈(n+1)(1−α)⌉ > n (the small-n case where conformal demands the
  * everything-set), which is behavior-identical to +∞ on a capped
  * grid.
  *
  * Scale shape: the calibration histogram is grouped on s7 (hard
  * bound 10⁷+1 distinct values, map-side combined), rank selection is
  * one sequential fold over that histogram, and the single-row stats
  * frame broadcasts onto the serving half. No global sort, no window
  * over rows, no driver round-trip.
  */
object Conformal {

  private val Grid = 10000000L

  private def md5Cal(idCol: String, seed: Long): Column =
    substring(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))
      .cast("binary")), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7")

  /** Smallest s7 whose cumulative count reaches `target` — the
    * [[Aggregates]] histogram-rank fold over a sorted (s7, cnt) array.
    */
  private def kthOfHist(arr: Column, target: Column): Column =
    aggregate(arr,
      struct(lit(0L).as("c"), lit(null).cast("long").as("m")),
      (acc, x) => struct(
        (acc("c") + x("__cnt")).as("c"),
        coalesce(acc("m"),
          when(acc("c") + x("__cnt") >= target, x("__s7"))).as("m")),
      acc => acc("m"))

  /** One-row audit of the split-conformal procedure at miscoverage
    * `alphaNum/alphaDen` over a scored frame (`labelCol` 0/1,
    * `probaCol` 7dp-rounded P(y=1)): calibration size and rank, the
    * selected quantile `q7` (grid units), and on the serving half the
    * covered count plus the prediction-set size distribution.
    */
  def splitConformalAudit(df: DataFrame, labelCol: String,
                          probaCol: String, idCol: String,
                          alphaNum: Int = 1, alphaDen: Int = 10,
                          seed: Long = 42L): DataFrame =
    auditAgg(servingFlags(df,
      calibrationStats(df, labelCol, probaCol, idCol, alphaNum,
        alphaDen, seed),
      labelCol, probaCol, idCol, seed))

  /** Both per-class grid scores plus the calibration-split flag —
    * stateless column algebra, so it applies identically to a batch
    * frame and a stream.
    */
  private def withScores(df: DataFrame, labelCol: String,
                         probaCol: String, idCol: String,
                         seed: Long): DataFrame =
    df.filter(col(labelCol).isNotNull && col(probaCol).isNotNull &&
        col(idCol).isNotNull)
      .withColumn("__cal", md5Cal(idCol, seed))
      // both per-class scores in grid units; __sy is the true-label one
      .withColumn("__s1",
        round((lit(1.0) - col(probaCol)) * lit(10000000.0)).cast("long"))
      .withColumn("__s0",
        round(col(probaCol) * lit(10000000.0)).cast("long"))
      .withColumn("__sy",
        when(col(labelCol) === 1, col("__s1")).otherwise(col("__s0")))

  /** One-row calibration frame `(__ncal, __k, __q7)` from the
    * hash-selected calibration half — the offline artifact a serving
    * deployment broadcasts next to the model coefficients.
    */
  def calibrationStats(df: DataFrame, labelCol: String,
                       probaCol: String, idCol: String,
                       alphaNum: Int = 1, alphaDen: Int = 10,
                       seed: Long = 42L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    val keep = alphaDen - alphaNum
    withScores(df, labelCol, probaCol, idCol, seed)
      .filter(col("__cal"))
      .groupBy(col("__sy").as("__s7"))
      .agg(count(lit(1)).as("__cnt"))
      .agg(sort_array(collect_list(struct(col("__s7"), col("__cnt"))))
        .as("__h"))
      .withColumn("__ncal",
        aggregate(col("__h"), lit(0L), (a, x) => a + x("__cnt")))
      .withColumn("__k",
        expr(s"((__ncal + 1) * $keep + $alphaDen - 1) div $alphaDen"))
      .withColumn("__q7",
        coalesce(kthOfHist(col("__h"), col("__k")), lit(Grid)))
      .select(col("__ncal"), col("__k"), col("__q7"))
  }

  /** Serving half with per-row prediction-set flags (`__c1`, `__c0`,
    * membership of the true label via `__sy <= __q7`) — `df` may be a
    * STREAMING frame: the whole path is a stateless projection plus a
    * stream-static broadcast join against the one-row stats frame,
    * exactly how a deployed scorer consumes an offline calibration.
    */
  def servingFlags(df: DataFrame, stats: DataFrame, labelCol: String,
                   probaCol: String, idCol: String,
                   seed: Long = 42L): DataFrame =
    withScores(df, labelCol, probaCol, idCol, seed)
      .filter(!col("__cal"))
      .crossJoin(broadcast(stats))
      .withColumn("__c1", (col("__s1") <= col("__q7")).cast("int"))
      .withColumn("__c0", (col("__s0") <= col("__q7")).cast("int"))

  /** The audit row over a flagged serving frame (batch, or a memory
    * sink a streaming [[servingFlags]] filled).
    */
  def auditAgg(flagged: DataFrame): DataFrame =
    flagged
      .agg(min(col("__ncal")).as("n_cal"), min(col("__k")).as("k"),
        min(col("__q7")).as("q7"),
        count(lit(1)).as("n_test"),
        sum(when(col("__sy") <= col("__q7"), 1L).otherwise(0L))
          .as("n_covered"),
        sum(when(col("__c1") + col("__c0") === 0, 1L).otherwise(0L))
          .as("n_set0"),
        sum(when(col("__c1") + col("__c0") === 1, 1L).otherwise(0L))
          .as("n_set1"),
        sum(when(col("__c1") + col("__c0") === 2, 1L).otherwise(0L))
          .as("n_set2"))
}
