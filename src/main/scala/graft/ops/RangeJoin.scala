package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, Spark-first.
  *
  * Spark plans a bare `point BETWEEN start AND end` join as a broadcast
  * nested loop (or worse, a cartesian) — O(|points| × |intervals|)
  * comparisons even when almost nothing overlaps. The banded form here
  * is the standard scale fix: quantize the range dimension into
  * fixed-width bins, emit each interval under every bin it touches and
  * each point under its own bin, equi-join on the bin, then verify the
  * exact containment predicate. Shuffle and compare cost become
  * O(points + intervals × avgSpan/binWidth + true matches) — linear,
  * skew-bounded by bin population, and the equi-join gets hash
  * partitioning, AQE, and codegen for free.
  *
  * `binWidth` tunes the explode factor vs bin selectivity: pick it near
  * the typical interval span so each interval lands in O(1) bins.
  */
object RangeJoin {

  /** Join rows of `points` to every row of `intervals` whose
    * [startCol, endCol] contains the point (inclusive both ends).
    * All three range columns must be numeric (epoch days/seconds/...).
    * Output: points columns + intervals columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol).cast("long") / binWidth))
    val iv = intervals
      // empty/inverted intervals can match nothing, and sequence(a, b)
      // with a > b would otherwise generate a DESCENDING bin range —
      // junk explode rows the containment filter pays to discard
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol).cast("long") / binWidth),
        floor(col(endCol).cast("long") / binWidth))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
