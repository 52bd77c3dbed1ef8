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

  /** Interval-overlap join: every (a, b) pair with
    * `a.start ≤ b.end AND b.start ≤ a.end` (inclusive ends). Both sides
    * explode to the bins they touch and meet in a bin equi-join, same
    * as [[pointInInterval]]; a pair that co-occupies several bins is
    * emitted from exactly ONE — the bin holding the overlap's left edge
    * `max(a.start, b.start)` — so no post-join `distinct` pass is
    * needed (that dedup would re-shuffle the full match set, the
    * dominant cost at scale). Column names must not collide across the
    * two sides.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      startA: String, endA: String,
                      startB: String, endB: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // fail fast instead of an ambiguous-resolution analysis error (or a
    // silently wrong join): the post-join filter resolves all four
    // range columns by bare name, so they must be distinct across
    // sides, and neither input may already carry the internal __bin
    val rangeCols = Seq(startA, endA, startB, endB)
    require(rangeCols.distinct.size == 4,
      s"start/end column names must be distinct across sides, got $rangeCols")
    Seq(("a", a, Seq(startB, endB)), ("b", b, Seq(startA, endA)))
      .foreach { case (side, df, other) =>
        val fields = df.columns.toSet
        require(!fields.contains("__bin"),
          s"input $side already has a __bin column (reserved)")
        other.filter(fields.contains).foreach { c =>
          throw new IllegalArgumentException(
            s"input $side also has the other side's range column '$c'; " +
              "rename one side before joining")
        }
      }
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(e) >= col(s))
      .withColumn("__bin", explode(sequence(
        floor(col(s).cast("long") / binWidth),
        floor(col(e).cast("long") / binWidth))))
    binned(a, startA, endA).join(binned(b, startB, endB), Seq("__bin"))
      .filter(col(startA) <= col(endB) && col(startB) <= col(endA) &&
        col("__bin") === floor(
          greatest(col(startA), col(startB)).cast("long") / binWidth))
      .drop("__bin")
  }
}
