package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Shard-knob arm for the packing family: t29/t30 fix nShards = 8 for
  * a deterministic oracle, which starves parallelism once the corpus
  * outgrows 8 sequential shards — this arm runs the SAME operators at
  * any shard count so the knob's effect is measured, not asserted
  * (packing is embarrassingly parallel across shards and strictly
  * sequential within one; production sizes nShards to the cluster).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.PackProbe <dir> <nShards> [reps]
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nShards = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val toks = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("doc_id").isNotNull &&
        length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ntok"))
    for (rep <- 1 to reps) {
      for ((name, df) <- Seq(
        "chunk" -> graft.ops.Packing.chunkPackStats(
          toks, "doc_id", "ntok", 512L, nShards),
        "nextfit" -> graft.ops.Packing.nextFitStats(
          toks, "doc_id", "ntok", 512L, nShards),
        "ffd" -> graft.ops.Packing.ffdStats(
          toks, "doc_id", "ntok", 512L, nShards))) {
        val t0 = System.nanoTime()
        val agg = df.agg(sum(col("n_docs")), sum(col("n_bins"))).first()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[packprobe] form=$name shards=$nShards rep=$rep " +
          f"secs=$secs%.2f docs=${agg.getLong(0)} bins=${agg.getLong(1)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
