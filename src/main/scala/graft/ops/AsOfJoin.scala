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
}
