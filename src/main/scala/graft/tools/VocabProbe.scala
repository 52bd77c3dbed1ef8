package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the d14/d20 `broadcastVocab` escape knob: times
  * [[graft.ops.Dedup.setSimilarityJoin]] and
  * [[graft.ops.Dedup.containmentJoin]] with the document-frequency
  * broadcast on vs off over the documents table, printing one JSON
  * line per arm (pair counts double as a result-parity check).
  *
  * Usage: runMain graft.tools.VocabProbe <sfDir>
  */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    def time(label: String, bv: Boolean): Unit = {
      val t0 = System.nanoTime()
      val nSet = graft.ops.Dedup
        .setSimilarityJoin(docs, "text", "doc_id", 3, 3, 5,
          broadcastVocab = bv).count()
      val t1 = System.nanoTime()
      val nCon = graft.ops.Dedup
        .containmentJoin(docs, "text", "doc_id", 3, 4, 5,
          broadcastVocab = bv).count()
      val t2 = System.nanoTime()
      println(f"""{"probe":"vocab","arm":"$label",""" +
        f""""d14_secs":${(t1 - t0) / 1e9}%.2f,"d14_pairs":$nSet,""" +
        f""""d20_secs":${(t2 - t1) / 1e9}%.2f,"d20_pairs":$nCon}""")
    }
    time("warmup_broadcast", bv = true)
    time("broadcast", bv = true)
    time("shuffle", bv = false)
    time("broadcast2", bv = true)
    spark.stop()
  }
}
