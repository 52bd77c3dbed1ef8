package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); this
  * is the standard extension-library shim — a minimal forwarder living
  * in the `org.apache.spark.sql` namespace. No Spark internals are
  * reimplemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Plan-side scan-parallelism estimate for `Layout.fanOut`: how many
    * partitions will this frame's scan produce, WITHOUT instantiating
    * the RDD lineage (`df.rdd` finalizes the physical plan outside AQE
    * and can eagerly materialize upstream stages). Walks the analyzed
    * logical plan (with cache substitution):
    *
    *   - file scans estimate `ceil(bytes / maxPartitionBytes)` splits;
    *   - narrow operators (project/filter/generate/expand/union/alias)
    *     preserve or sum their children's estimates;
    *   - already-materialized caches report their actual block count
    *     (free — the RDD exists);
    *   - anything that implies an exchange (joins, aggregates, windows,
    *     repartitions) or an opaque source returns None: downstream
    *     partitioning there belongs to AQE, and fan-out must not
    *     second-guess it.
    */
  def estimateScanPartitions(df: DataFrame): Option[Long] = {
    val session = df.sparkSession
    val maxSplit = math.max(1L, session.sessionState.conf.filesMaxPartitionBytes)
    val defaultPar = session.sparkContext.defaultParallelism.toLong
    def fileEst(rel: HadoopFsRelation): Long =
      math.max(1L, (rel.location.sizeInBytes + maxSplit - 1) / maxSplit)
    // an un-materialized cache holds a physical plan: estimate from its
    // file scans unless a shuffle sits between scan and cache
    def physical(p: SparkPlan): Option[Long] =
      if (p.collectFirst { case s: ShuffleExchangeExec => s }.isDefined) None
      else {
        val scans = p.collect { case s: FileSourceScanExec => s }
        if (scans.isEmpty) None
        else Some(scans.map(s => fileEst(s.relation)).sum)
      }
    def walk(p: logical.LogicalPlan): Option[Long] = p match {
      case u: logical.Union =>
        val parts = u.children.map(walk)
        if (parts.forall(_.isDefined)) Some(parts.flatten.sum) else None
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => Some(fileEst(fs))
        case _ => None
      }
      case r: InMemoryRelation =>
        if (r.cacheBuilder.isCachedColumnBuffersLoaded)
          Some(r.cacheBuilder.cachedColumnBuffers.getNumPartitions.toLong)
        else physical(r.cachedPlan)
      case l: logical.LocalRelation =>
        // LocalTableScanExec parallelizes to min(rows, leaf default)
        Some(math.min(math.max(l.data.length.toLong, 1L), defaultPar))
      case _: logical.LeafNode => None
      case _: logical.Project | _: logical.Filter |
           _: logical.SubqueryAlias | _: logical.Generate |
           _: logical.Expand =>
        walk(p.children.head)
      case _ => None
    }
    walk(df.queryExecution.withCachedData)
  }
}
