package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB path: skew-tolerant
  * aggregation, co-located (bucketed) joins, range layout.
  *
  * These encode the three standing answers to "would this plan survive a
  * 100× scale-up": a hot key melts a single reducer → salt it; a
  * repeated big join on the same key shuffles every query → bucket both
  * sides once; range queries scan everything → range-partition so
  * pruning has boundaries to work with.
  */
object Layout {

  /** Round-robin fan-out for compute-amplifying pipelines (block
    * formatting, hash signatures, per-row kernels): when the upstream
    * scan yields fewer partitions than cores — a single small parquet
    * file, a single row group, a collapsed coalesce — every downstream
    * projection runs on one task no matter how wide the cluster is.
    * Repartitioning the NARROW input rows (cheap to shuffle) before the
    * expensive projection restores full parallelism. No-op when the
    * plan already has at least `min` partitions, so applying it to a
    * properly-split 100 TB scan costs nothing.
    */
  def fanOut(df: DataFrame, min: Int = 0): DataFrame = {
    val target =
      if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Two-phase salted count/sum for skewed grouping keys: the partial
    * aggregate on (key, salt) spreads a hot key over `saltBuckets`
    * reducers, then a cheap final aggregate on key merges partials.
    * AQE's skew handling covers joins; aggregation skew still lands a
    * hot key on one reducer — this is the explicit fix for the additive
    * shapes (count/sum; min/max merge the same way).
    */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", (rand(42) * saltBuckets).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("s"))
    partial.groupBy(col("key"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
  }

  /** Write both sides of a recurring equi-join bucketed on the join key:
    * subsequent joins between the saved tables are shuffle-free
    * (SortMergeJoin over pre-bucketed scans). Requires a catalog
    * (`spark.sql.warehouse.dir`); buckets must match on both sides.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Range-partitioned parquet layout: `repartitionByRange` + partition
    * column directory layout so min/max pruning and partition pruning
    * both engage for range predicates.
    */
  def writeRangeLayout(df: DataFrame, path: String, rangeCol: String,
                       partitions: Int): Unit =
    df.repartitionByRange(partitions, col(rangeCol))
      .write.mode("overwrite")
      .parquet(path)
}
