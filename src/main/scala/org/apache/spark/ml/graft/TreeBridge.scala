package org.apache.spark.ml.graft

import org.apache.spark.ml.tree.LeafNode

/** Leaf-statistics accessor for fitted MLlib trees.
  *
  * `LeafNode.impurityStats` is `private[ml]` in Spark 4, but it holds
  * the per-class training counts that
  * `RandomForestClassificationModel.predictRaw` normalizes into each
  * tree's probability vote — exactly what a fixed-structure serving
  * twin (graft.ml.TreeScorer.fromRf) needs to extract. This is the
  * same minimal-forwarder shim pattern as
  * `org.apache.spark.sql.graft.Bridge`: one accessor in the `ml`
  * namespace, no Spark internals reimplemented.
  */
object TreeBridge {

  /** The leaf's per-class stats array (class counts for
    * classification impurities), defensively copied.
    */
  def leafStats(leaf: LeafNode): Array[Double] =
    leaf.impurityStats.stats.clone()
}
