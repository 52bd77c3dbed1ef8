package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition, quantized — the
  * time-series screen behind "is this hour's spend spike a fraud burst
  * or just lunchtime?" (the reference eyeballs this on its dashboard's
  * hourly chart, `FD/dashboard.py`; here it is an operator).
  *
  * `value = trend + seasonal + residual` per group:
  *  - trend_{g,day}    — the day's integer-mean cents (low-frequency
  *    level: weekday drift, campaign steps),
  *  - seasonal_{g,hour} — the hour-of-day integer-mean of detrended
  *    values (the daily rhythm),
  *  - residual          — what neither explains; the anomaly signal.
  *
  * All three components are integers: means are exact BIGINT sums
  * divided with the engines' native truncate-toward-zero integer
  * division (JVM `/` ≡ DuckDB `//`), so the decomposition is
  * engine-identical bit for bit — no doubles anywhere. The sub-cent
  * truncation bias is irrelevant for a seasonality profile and is the
  * price of a hash-exact oracle.
  *
  * Scale shape: one grouped agg per component — (group, day) then
  * (group, hour) — each map-side combined; the trend frame joins back
  * on its own grouping key (co-partitioned shuffle, no window, no
  * sort), the hour frame is groups×24 rows and broadcasts. Group and
  * day cardinality are unbounded; nothing touches the driver.
  */
object Seasonal {

  /** Appends `day`, `hour`, `trend`, `seasonal`, `resid` (all BIGINT;
    * cents-scale) to rows with non-null group/timestamp/cents.
    * `tsUsCol` is epoch-microseconds; `centsCol` integer cents.
    */
  def decomposeDayHour(df: DataFrame, groupCol: String, tsUsCol: String,
                       centsCol: String): DataFrame = {
    val rows = df
      .filter(col(groupCol).isNotNull && col(tsUsCol).isNotNull &&
        col(centsCol).isNotNull)
      .withColumn("day", expr(s"$tsUsCol div 86400000000"))
      .withColumn("hour", expr(s"($tsUsCol div 3600000000) % 24"))
    val trend = rows.groupBy(col(groupCol).as("__tg"), col("day").as("__td"))
      .agg(sum(col(centsCol)).as("__s"), count(lit(1)).as("__n"))
      .withColumn("trend", expr("__s div __n")).drop("__s", "__n")
    val detrended = rows
      .join(trend, col(groupCol) === col("__tg") &&
        col("day") === col("__td"))
      .drop("__tg", "__td")
      .withColumn("__dev", col(centsCol) - col("trend"))
    val seasonal = detrended
      .groupBy(col(groupCol).as("__sg"), col("hour").as("__sh"))
      .agg(sum(col("__dev")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("seasonal", expr("__s div __n")).drop("__s", "__n")
    detrended
      .join(broadcast(seasonal), col(groupCol) === col("__sg") &&
        col("hour") === col("__sh"))
      .drop("__sg", "__sh")
      .withColumn("resid",
        col(centsCol) - col("trend") - col("seasonal"))
      .drop("__dev")
  }
}
