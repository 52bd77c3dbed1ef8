package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution shape (SURVEY §2.6,
  * beyond the reference surface: the reference's consumer is a
  * per-record loop with no joins, `FD/consumer.py:114`).
  *
  * Each left event joins right events of the same key whose event time
  * lands in `[leftTime, leftTime + horizon]`. Both inputs MUST carry
  * event-time columns; this helper applies the watermarks itself. The
  * watermark + the time-range join condition are what let Spark bound
  * the join state: the left side can be evicted once the right
  * watermark passes `leftTime + horizon`, the right side once the left
  * watermark passes its time. Without the range condition the state
  * grows without bound — the join would be rejected for append mode.
  *
  * At 100 TB the join shuffles both streams once on the key; state per
  * partition is bounded by (arrival rate × horizon), independent of
  * history length.
  */
object Attribution {

  /** Join `left` to `right` on `keyCol`, keeping pairs where
    * `right.rightTimeCol ∈ [left.leftTimeCol, left.leftTimeCol +
    * horizon]`. Column names must be disjoint across the two inputs
    * except `keyCol`, which is required on both and deduplicated.
    *
    * `joinType` may be `inner` (default) or `left_outer`: the outer
    * form emits a left row with null right columns once the watermark
    * passes `leftTime + horizon` and no match arrived — the "click
    * that never converted" record. The emission is watermark-driven,
    * so unmatched rows surface only after the stream's event time
    * moves past the horizon (plus the lateness bound).
    *
    * @param horizon   SQL interval literal body, e.g. "10 minutes"
    * @param watermark lateness bound applied to BOTH event-time columns
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   horizon: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"column names must be disjoint apart from $keyCol: $overlap")
    val l = left.withWatermark(leftTimeCol, watermark)
    val r = right.withColumnRenamed(keyCol, "__rk")
      .withWatermark(rightTimeCol, watermark)
    l.join(r,
        col(keyCol) === col("__rk") &&
          col(rightTimeCol) >= col(leftTimeCol) &&
          col(rightTimeCol) <= col(leftTimeCol) +
            expr(s"INTERVAL $horizon"),
        joinType)
      .drop("__rk")
  }
}
