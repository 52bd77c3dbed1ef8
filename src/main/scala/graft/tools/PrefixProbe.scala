package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-arm uncapped probe for the prefix-filter join family — the
  * 50× disk-budget variant of [[VocabProbe]]: one op, one timed run
  * per JVM, so the shuffle spill of d14's exploded (id, token) corpus
  * and d20's never coexist on the sandbox's single disk (the 4-arm
  * VocabProbe hit ENOSPC at 50×; a real cluster spreads this spill
  * over per-executor disks).
  *
  * Usage: runMain graft.tools.PrefixProbe <sfDir> <d14|d20>
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm the scan
    val t0 = System.nanoTime()
    val pairs = op match {
      case "d14" => graft.ops.Dedup
        .setSimilarityJoin(docs, "text", "doc_id", 3, 3, 5).count()
      case "d20" => graft.ops.Dedup
        .containmentJoin(docs, "text", "doc_id", 3, 4, 5).count()
      case "d14h" => graft.ops.Dedup
        .setSimilarityJoin(docs, "text", "doc_id", 3, 3, 5,
          hashTokens = true).count()
      case "d20h" => graft.ops.Dedup
        .containmentJoin(docs, "text", "doc_id", 3, 4, 5,
          hashTokens = true).count()
      case other => sys.error(s"unknown op $other")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"prefix","op":"$op","dir":"$dir",""" +
      f""""secs":$secs%.2f,"pairs":$pairs}""")
    spark.stop()
  }
}
