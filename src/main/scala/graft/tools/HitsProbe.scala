package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Diagnostic: time each phase of the g13 HITS query to localize the
  * per-action cost. Usage: runMain graft.tools.HitsProbe <sfDir>
  */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hitsprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val membership = Tables.events(spark, sfDir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("attr"))
      .filter(col("user_id").isNotNull && col("attr").isNotNull)
      .groupBy(col("user_id"), col("attr"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .select(col("user_id"), col("attr"))
    t("qualify+count")(println("[hitsprobe] m rows = " + membership.count()))
    // replicate the op's loop with a timer per materialization
    val m = membership
      .select(col("user_id").cast("long").as("__mu"),
        col("attr").cast("long").as("__ma"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("m persist+count")(m.count())
    val scale = 1000000L
    def rescale(df: org.apache.spark.sql.DataFrame, lbl: String)
        : org.apache.spark.sql.DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"$lbl count")(p.count())
      val mx = p.agg(max(col("__s")).as("__mx"))
      p.crossJoin(broadcast(mx))
        .selectExpr("node", s"(__s * CAST($scale AS BIGINT)) div __mx AS score")
    }
    var hubs = m.select(col("__mu").as("node")).distinct()
      .withColumn("score", lit(scale))
    var auths: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to 3) {
      val aRaw = m.join(hubs.withColumnRenamed("node", "__mu"), Seq("__mu"))
        .groupBy(col("__ma").as("node")).agg(sum(col("score")).as("__s"))
      auths = rescale(aRaw, s"round$i auth")
      val hRaw = m.join(auths.withColumnRenamed("node", "__ma"), Seq("__ma"))
        .groupBy(col("__mu").as("node")).agg(sum(col("score")).as("__s"))
      hubs = rescale(hRaw, s"round$i hub")
    }
    t("final union+orderBy+count") {
      println("[hitsprobe] out = " + auths.select(lit("auth").as("kind"),
          col("node"), col("score"))
        .unionByName(hubs.select(lit("hub").as("kind"), col("node"),
          col("score")))
        .orderBy(col("kind"), col("node")).count())
    }
    spark.stop()
  }
}
