package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row
  * with the same key and `rightTime <= leftTime` — the point-in-time
  * feature join a training-data pipeline needs to avoid label leakage.
  *
  * Spark-first composition (preference (a) from the custom-operator
  * ladder — no custom strategy needed): tag both sides, union, and run
  * one `last(_, ignoreNulls)` window per value column ordered by
  * (time, side) within the key partition. Right rows sort before left
  * rows at equal timestamps, so the match is inclusive. Cost: ONE
  * shuffle on the key + a per-key sort — the same price as a regular
  * sort-merge join, with no range-condition explosion.
  *
  * Right-side rows must be unique per (key, time) — dedupe upstream
  * (e.g. `max_by` on an ordinal) or matches at duplicated timestamps
  * are ambiguous.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               rightValueCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap

    val lPacked = rightValueCols.foldLeft(
      left.select(col(keyCol).as("__k"),
        col(leftTime).cast("long").as("__t"),
        lit(1).as("__side"), leftStruct.as("__lrow"))) {
      (d, c) => d.withColumn(prefix + c, lit(null).cast(rightTypes(c)))
    }
    val rPacked = right.select(
      Seq(col(keyCol).as("__k"), col(rightTime).cast("long").as("__t"),
        lit(0).as("__side"),
        lit(null).cast(left.schema).as("__lrow")) ++
        rightValueCols.map(c => col(c).as(prefix + c)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(lPacked.unionByName(rPacked)) {
      (d, c) =>
        d.withColumn(prefix + c,
          last(col(prefix + c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(col("__lrow.*") +:
        rightValueCols.map(c => col(prefix + c)): _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row
    * with the same key and `rightTime >= leftTime` (inclusive) — the
    * "next event after" lookup (next price tick, next maintenance
    * window). Mirror of [[backward]]: one union, one key shuffle, a
    * `first(_, ignoreNulls)` window over the frame ahead; left rows
    * sort before right rows at equal timestamps so the match is
    * inclusive.
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
              leftTime: String, rightTime: String,
              rightValueCols: Seq[String],
              prefix: String = "asof_"): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap

    val lPacked = rightValueCols.foldLeft(
      left.select(col(keyCol).as("__k"),
        col(leftTime).cast("long").as("__t"),
        lit(0).as("__side"), leftStruct.as("__lrow"))) {
      (d, c) => d.withColumn(prefix + c, lit(null).cast(rightTypes(c)))
    }
    val rPacked = right.select(
      Seq(col(keyCol).as("__k"), col(rightTime).cast("long").as("__t"),
        lit(1).as("__side"),
        lit(null).cast(left.schema).as("__lrow")) ++
        rightValueCols.map(c => col(c).as(prefix + c)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = rightValueCols.foldLeft(lPacked.unionByName(rPacked)) {
      (d, c) =>
        d.withColumn(prefix + c,
          first(col(prefix + c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0)
      .select(col("__lrow.*") +:
        rightValueCols.map(c => col(prefix + c)): _*)
  }

  /** Nearest as-of join: whichever right row (same key) is closest in
    * time, looking both ways; a tie keeps the backward match (the
    * pandas `merge_asof(direction='nearest')` shape). One union, ONE
    * key shuffle, and two RANGE-framed window passes over the same
    * sort — range frames include equal-time peers in both directions,
    * so an exact-time right row matches at distance 0 from either
    * side. The matched right time rides along as `<prefix>time`.
    */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String,
              leftTime: String, rightTime: String,
              rightValueCols: Seq[String],
              prefix: String = "asof_"): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap

    val lPacked = rightValueCols.foldLeft(
      left.select(col(keyCol).as("__k"),
        col(leftTime).cast("long").as("__t"),
        lit(1).as("__side"), leftStruct.as("__lrow"),
        lit(null).cast("long").as("__rt"))) {
      (d, c) => d.withColumn("__v_" + c, lit(null).cast(rightTypes(c)))
    }
    val rPacked = right.select(
      Seq(col(keyCol).as("__k"), col(rightTime).cast("long").as("__t"),
        lit(0).as("__side"),
        lit(null).cast(left.schema).as("__lrow"),
        col(rightTime).cast("long").as("__rt")) ++
        rightValueCols.map(c => col(c).as("__v_" + c)): _*)

    // RANGE frames over the numeric time include same-__t peers on
    // both sides; right rows are unique per (key, time) by contract,
    // so the single non-null among peers makes last/first well-defined
    val wB = Window.partitionBy(col("__k")).orderBy(col("__t").asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k")).orderBy(col("__t").asc)
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = rightValueCols.foldLeft(
      lPacked.unionByName(rPacked)
        .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wB))
        .withColumn("__ft", first(col("__rt"), ignoreNulls = true).over(wF))) {
      (d, c) =>
        d.withColumn("__b_" + c,
            last(col("__v_" + c), ignoreNulls = true).over(wB))
          .withColumn("__f_" + c,
            first(col("__v_" + c), ignoreNulls = true).over(wF))
    }
    // distance decides; a tie (incl. exact-time hit) keeps backward
    val takeBackward = col("__ft").isNull ||
      (col("__bt").isNotNull &&
        col("__t") - col("__bt") <= col("__ft") - col("__t"))
    val chosen = rightValueCols.foldLeft(
      filled.withColumn(prefix + "time",
        when(takeBackward, col("__bt")).otherwise(col("__ft")))) {
      (d, c) =>
        d.withColumn(prefix + c,
          when(takeBackward, col("__b_" + c)).otherwise(col("__f_" + c)))
    }
    chosen.filter(col("__side") === 1)
      .select(col("__lrow.*") +:
        ((prefix + "time") +: rightValueCols.map(prefix + _)).map(col): _*)
  }
}
