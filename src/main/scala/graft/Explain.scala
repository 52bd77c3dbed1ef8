package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain("formatted")` for the named queries
  * (or all), for pushdown/broadcast/codegen review.
  * Usage: runMain graft.Explain <sfDir> [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fall back to per-operator execution (compiled expressions, JIT-able)
      // for stages whose fused processNext would exceed HotSpot's 8000-byte
      // JIT ceiling and run as interpreted bytecode (~50x slower)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
