package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Rotating-population churn arm for the per-entity sketch states
  * (r12 verdict mandate #1's missing axis): the eviction work is
  * only worth its complexity if, under entity CHURN, the state store
  * plateaus at the horizon-RESIDENT population instead of growing
  * with entities-ever-seen. This probe measures exactly that, for
  * both [[graft.streaming.StreamVelocity.kllQuantileStates]] and
  * [[graft.streaming.StreamSketch.hhStates]].
  *
  * Protocol: the corpus's event time axis splits into `epochs`
  * equal spans; every event is re-keyed to `epoch·10⁶ + (user %
  * residents)` — so each epoch has `residents` entities, ALL of them
  * new (entities-ever-seen = epochs × residents, resident population
  * = residents). One mtime-ordered staged file per epoch advances
  * the watermark epoch by epoch. Horizon = one epoch span: an
  * entity's state must evict once its epoch is two behind the
  * watermark. Expected: `state_rows_final ≈ 2 × residents`
  * (current + draining epoch) with the horizon on, `= epochs ×
  * residents` with it off — the off arm is the control, run at the
  * same staging.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ChurnProbe
  *   <dir> [epochs] [residents] [reps]
  */
object ChurnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val epochs = if (args.length > 1) args(1).toInt else 10
    val residents = if (args.length > 2) args(2).toLong else 500L
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", Tables.streamParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.eventsMicros(spark, dir)
      .filter(col("user_id").isNotNull && col("ts_us").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), col("ts_us"), col("value"))
    val stats = ev.agg(min(col("ts_us")), max(col("ts_us"))).first()
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val span = (mx - mn) / epochs + 1
    val keyed = ev
      .withColumn("__epoch", expr(s"(ts_us - ${mn}L) div ${span}L"))
      .withColumn("entity",
        (col("__epoch") * 1000000L +
          pmod(col("user_id"), lit(residents))).cast("string"))
      .withColumn("item", pmod(col("user_id"), lit(1000L)))

    for (rep <- 1 to reps) {
      val stage = Tables.stageDir(spark, s"churn_r$rep")
      val base = System.currentTimeMillis()
      (0 until epochs).foreach { i =>
        Tables.stageOne(stage,
          keyed.filter(col("__epoch") === i.toLong)
            .select(col("entity"), col("ts_us"), col("value"),
              col("item")),
          f"b$i%02d", base - 1200000 + i * 60000)
      }
      val schema = spark.read.parquet(s"$stage/b00.parquet").schema
      for (variant <- Seq("kll", "hh"); horizonOn <- Seq(true, false)) {
        val qn = s"churn_${variant}_${if (horizonOn) "on" else "off"}_r$rep"
        val t0 = System.nanoTime()
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val stream =
          if (variant == "kll")
            graft.streaming.StreamVelocity.kllQuantileStates(
              src, "entity", "value", capacity = 256,
              percents = Seq(50, 99),
              tsUsCol = if (horizonOn) "ts_us" else null,
              evictHorizonUs = if (horizonOn) span else 0L).toDF
          else
            graft.streaming.StreamSketch.hhStates(
              src, "entity", "item", k = 16,
              tsUsCol = if (horizonOn) "ts_us" else null,
              evictHorizonUs = if (horizonOn) span else 0L).toDF
        val q = stream.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val secs = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress.toSeq
          .filter(_.stateOperators.nonEmpty)
        val finalRows =
          if (prog.isEmpty) -1L
          else prog.last.stateOperators.map(_.numRowsTotal).sum
        val maxRows =
          if (prog.isEmpty) -1L
          else prog.map(_.stateOperators.map(_.numRowsTotal).sum).max
        val outRows = spark.table(qn).count()
        println(f"[churnprobe] variant=$variant horizon=" +
          s"${if (horizonOn) "on" else "off"} rep=$rep " +
          f"secs=$secs%.2f epochs=$epochs residents=$residents " +
          s"entities_total=${epochs * residents} " +
          s"state_rows_final=$finalRows state_rows_max=$maxRows " +
          s"out_rows=$outRows parts=${Tables.streamParts}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
