package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Lateness-dimension sweep for the bounded-lateness reorder family
  * (r11 verdict mandate #6): st23/st24 are volume-probed, but the
  * reorder buffer's STATE is rate × L — this arm sweeps L itself and
  * reports wall time plus the state store's own rows/bytes metrics,
  * so the L-vs-memory sizing rule next to SPARK_GRAFT_STREAM_PARTS
  * in SCALEPROBE is measured, not asserted.
  *
  * Protocol = the st23 staging recipe with L parametric: events
  * re-staged into three mtime-ordered files split on JITTERED event
  * time (deterministic ±L/2 xxhash64 of event_id — the jitter grows
  * with L, so the cross-batch overlap band, and therefore the held
  * buffer, is genuinely ∝ rate × L), plus a per-user punctuation
  * file past max + L that drains every buffer. Output correctness is
  * not re-gated here (st23's oracle row owns that); the probe reads
  * the TIME and STATE axes.
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_STREAM_PARTS=8]
  *   runMain graft.tools.ReorderProbe <dir> [latenessMinsCsv] [reps]
  */
object ReorderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val latenessMins =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(15, 60, 360)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", Tables.streamParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (lm <- latenessMins; rep <- 1 to reps) {
      val lateUs = lm * 60000000L
      val jit = lateUs / 2
      val stage = Tables.stageDir(spark, s"reorder_L${lm}_r$rep")
      val ev = Tables.eventsMicros(spark, dir)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_type"),
          (col("ts_us") + pmod(xxhash64(col("event_id")),
            lit(2 * jit + 1)) - jit).as("__pt"))
      val stats = ev.agg(min(col("__pt")), max(col("__pt")),
        max(col("ts_us"))).first()
      val (mnPt, mxPt, mxTs) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      val span = (mxPt - mnPt) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          ev.filter(col("__pt") >= mnPt + i * span &&
              col("__pt") < mnPt + (i + 1) * span)
            .select(col("user_id"), col("ts_us"), col("event_type")),
          s"b$i", base - 240000 + i * 60000)
      }
      Tables.stageOne(stage,
        ev.select(col("user_id")).distinct()
          .withColumn("ts_us", lit(mxTs + lateUs + 1))
          .withColumn("event_type", lit(null).cast("string")),
        "b3", base - 60000)
      val schema = spark.read.parquet(s"$stage/b0.parquet").schema
      val qn = s"reorder_probe_L${lm}_r$rep"
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = graft.streaming.StreamVelocity.trailingCounts(
          src, "user_id", "ts_us", "event_type",
          windowMicros = 3600L * 1000000L, maxLateness = lateUs)
        .toDF.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val stOps = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      val maxRows = if (stOps.isEmpty) -1L else stOps.map(_.numRowsTotal).max
      val maxBytes = if (stOps.isEmpty) -1L else stOps.map(_.memoryUsedBytes).max
      val outRows = spark.table(qn).count()
      val oooMax = spark.table(qn).agg(max(col("ooo"))).first().getLong(0)
      println(f"[reorderprobe] lateness_min=$lm rep=$rep secs=$secs%.2f " +
        s"state_rows=$maxRows state_bytes=$maxBytes out_rows=$outRows " +
        s"ooo_max=$oooMax parts=${Tables.streamParts}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
