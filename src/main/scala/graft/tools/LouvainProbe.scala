package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timer for the g18 louvain loop at sf0.1 — where do the
  * seconds go (edges, q0, per-level sweep/cut/coarsen/score)?
  * Usage: runMain graft.tools.LouvainProbe <sfDir> [cpus]
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup
    graft.queries.Tables.events(spark, sfDir).count()
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = graft.ops.Graph.coAttributeEdges(
      graft.queries.Tables.events(spark, sfDir).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("attr")),
      "user_id", "attr", minEvents = 3).persist(disk)
    t("edges materialize")(edges.count())
    val cut = (df: org.apache.spark.sql.DataFrame) =>
      graft.ops.Layout.materializeBounded(df, maxRows = 10000000L)
    val e0 = edges.select(col("u"), col("v"), lit(1L).as("w"))
    val q0 = t("q0 singletonQNum")(
      graft.ops.Community.singletonQNum(e0, noSelfLoops = true))
    var wedges = e0
    for (level <- 1 to 3) {
      val memb = t(s"L$level sweep+cut")(cut(
        graft.ops.Community.greedyMoveFromSingletonsW(wedges,
          downOnly = level >= 2)))
      t(s"L$level mc agg")(memb.agg(
        sum(when(col("moved"), 1L).otherwise(0L)),
        count_distinct(col("comm"))).head())
      val mb = memb.select(col("node"), col("comm"))
      val ce = t(s"L$level coarsen+cut")(cut(
        graft.ops.Community.coarsen(wedges, mb)))
      val qk = t(s"L$level qk")(graft.ops.Community.singletonQNum(ce))
      wedges = ce
    }
    println(s"[probe] q0=$q0 done")
    spark.stop()
  }
}
