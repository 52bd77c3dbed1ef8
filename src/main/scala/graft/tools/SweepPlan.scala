package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for the r13 Louvain-family optimization: the g14–g18
  * queries end in `materializeBounded` pins, so `graft.Explain` prints
  * them as LocalTableScan and the interesting plan — the local-move
  * SWEEP itself — is one level down. This prints `explain("formatted")`
  * for the general sweep ([[graft.ops.Community.greedyMovePassW]] from
  * an explicit singleton membership — the pre-r13 shape) and the
  * specialized singleton fast path, over the same sf co-attribute edge
  * list, so the 8-exchange → 3-exchange diff is checkable from files.
  *
  * Usage: runMain graft.tools.SweepPlan <sfDir>
  */
object SweepPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.ops.Graph.coAttributeEdges(
      graft.queries.Tables.events(spark, sfDir).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("attr")),
      "user_id", "attr", minEvents = 3)
    val nodes = graft.ops.Graph.symmetrize(edges)
      .select(col("u").as("node")).distinct()
    println("========== general sweep from explicit singletons " +
      "(pre-r13 path) ==========")
    graft.ops.Community.greedyMovePass(edges,
      nodes.withColumn("comm", col("node"))).explain("formatted")
    println("========== singleton fast path (r13) ==========")
    graft.ops.Community.greedyMoveFromSingletons(edges)
      .explain("formatted")
    spark.stop()
  }
}
