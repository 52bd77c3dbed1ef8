package graft
import org.apache.spark.sql.SparkSession
/** Plan inspector: `runMain graft.Explain <queryName> [sfDir]` prints
  * the pre-execution formatted plan, then runs the query and prints
  * the post-AQE executed plan plus exchange/reuse counts — the
  * per-operator "would this plan survive 100×?" audit loop.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"==== $name: logical-optimized → physical (pre-execution) ====")
    df.explain("formatted")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"==== $name: executed (post-AQE) ====")
    println(plan)
    def count(p: String) = p.r.findAllIn(plan).length
    println(s"[explain] exchanges=${count("Exchange ")} " +
      s"reused=${count("ReusedExchange")} " +
      s"aggregates=${count("HashAggregate")} " +
      s"broadcasts=${count("BroadcastExchange")} " +
      s"codegenSpans=${count("WholeStageCodegen")}")
    spark.stop()
  }
}
