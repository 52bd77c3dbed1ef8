package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pareto-frontier (skyline) selection: the rows not dominated on any
  * of `dims` (all maximized) — the data-curation shape "keep documents
  * that are best in at least one trade-off direction" (quality vs
  * length vs diversity), the multi-criteria analogue of the reference's
  * single-score fraud ranking (`FD/evaluation.py:150-179` ranks by one
  * mode count; a curation pipeline trades several signals off).
  *
  * Scale shape: a naive skyline is the all-pairs dominance θ-join.
  * This runs in two passes instead:
  *
  *  1. PIVOT PRUNE — one map-side-combining aggregate computes the
  *     per-dimension argmax rows (`max_by`, one job, d rows collected).
  *     Each pivot is itself non-dominated-or-dominated-by-another-pivot,
  *     and any row STRICTLY dominated by a pivot cannot be in the
  *     skyline, so one codegen'd scan with the d pivot vectors inlined
  *     as literals discards the overwhelming mass of a 100-TB input —
  *     no join, no shuffle.
  *  2. EXACT PASS — survivors are counted under an explicit
  *     `maxFrontier` guard (the [[Layout.materializeBounded]]
  *     discipline: the bound is a contract, not a comment — dominance
  *     chains always end at a surviving point, so pruning never drops
  *     a true skyline row, but the residual all-pairs check is only
  *     affordable on a bounded frontier) and then anti-joined against
  *     their broadcast selves on the dominance predicate — a hinted
  *     BroadcastNestedLoopJoin the CartesianGuard interlock admits.
  *
  * Dominance is the standard strict Pareto order: b dominates a iff
  * b ≥ a on every dim and b > a on at least one. Rows with equal
  * vectors do not dominate each other — duplicates of a frontier
  * vector are ALL kept (matching the SQL NOT EXISTS oracle).
  * Null ids or null dims are dropped up front.
  */
object Skyline {

  /** b-side struct dominates a-side struct (both projections of the
    * same dim list, resolved through the given column prefixes).
    */
  private def dominates(bCol: String => Column, aCol: String => Column,
                        dims: Seq[String]): Column =
    dims.map(d => bCol(d) >= aCol(d)).reduce(_ && _) &&
      dims.map(d => bCol(d) > aCol(d)).reduce(_ || _)

  /** One pivot row per dimension: the row carrying that dimension's
    * maximum (ties resolved arbitrarily by max_by — the final skyline
    * is pivot-choice-invariant, see [[skylineCached]]).
    */
  private def pivotRows(base: DataFrame, dims: Seq[String]): Array[Row] = {
    val payload = struct(dims.map(col): _*)
    val aggs = dims.map(d => max_by(payload, col(d)).as(s"__p_$d"))
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    dims.indices.map(i => row.getStruct(i)).toArray
  }

  private def prunedByPivots(base: DataFrame, dims: Seq[String],
                             pivots: Array[Row]): DataFrame = {
    val keep = pivots.map { p =>
      val dominatedByP = dominates(
        d => lit(p.get(dims.indexOf(d))), d => col(d), dims)
      !dominatedByP
    }.reduce(_ && _)
    base.filter(keep)
  }

  /** Skyline with the input persisted for its two passes (pivot scan +
    * prune scan); call `.release()` after the consuming action. The
    * survivor frame materializes through an eager count/collect guard
    * and is NOT part of the handle.
    *
    * @throws IllegalArgumentException if more than `maxFrontier` rows
    *         survive pivot pruning — the exact pass would be an
    *         unbounded quadratic check, which this op refuses by
    *         contract (same stance as [[Layout.materializeBounded]]).
    */
  def skylineCached(df: DataFrame, idCol: String, dims: Seq[String],
                    maxFrontier: Long = 100000L): Cached = {
    val base = prepared(df, idCol, dims)
      .persist(StorageLevel.MEMORY_AND_DISK)
    Cached(frontierOf(base, idCol, dims, maxFrontier), Seq(base))
  }

  /** Leak-free plain form: no persist — the pivot pass and the prune
    * pass each re-run the (narrow) input projection once.
    */
  def skyline(df: DataFrame, idCol: String, dims: Seq[String],
              maxFrontier: Long = 100000L): DataFrame =
    frontierOf(prepared(df, idCol, dims), idCol, dims, maxFrontier)

  private def prepared(df: DataFrame, idCol: String,
                       dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    require(!dims.contains(idCol), s"idCol $idCol cannot be a dimension")
    df.filter((idCol +: dims).map(c => col(c).isNotNull).reduce(_ && _))
      .select((col(idCol) +: dims.map(col)): _*)
  }

  private def frontierOf(base: DataFrame, idCol: String,
                         dims: Seq[String], maxFrontier: Long): DataFrame = {
    val spark = base.sparkSession
    val pivots = pivotRows(base, dims)
    if (pivots.isEmpty || pivots.head == null)
      return base.limit(0) // empty input
    val surv = prunedByPivots(base, dims, pivots)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = surv.count()
    require(n <= maxFrontier,
      s"skyline: $n rows survive pivot pruning (> maxFrontier " +
        s"$maxFrontier); refusing the unbounded quadratic exact pass")
    // bounded: move survivors into a local relation (one collect) so
    // the exact pass is LocalRelation × broadcast(LocalRelation) and
    // the persisted scratch frame can be dropped eagerly
    val rows = surv.collect()
    surv.unpersist(blocking = false)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), surv.schema)
    val other = local.select(
      dims.map(d => col(d).as(s"__b_$d")): _*)
    local.join(broadcast(other),
        dominates(d => col(s"__b_$d"), d => col(d), dims), "left_anti")
  }
}
