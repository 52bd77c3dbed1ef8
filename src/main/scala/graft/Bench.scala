package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the container's effective CPU swings ~3.5× between runs: take the
    // min of `reps` full passes so per-query numbers reflect the code,
    // not a noisy-neighbor moment, and record the load average alongside
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fall back to per-operator execution (compiled expressions, JIT-able)
      // for stages whose fused processNext would exceed HotSpot's 8000-byte
      // JIT ceiling and run as interpreted bytecode (~50x slower).
      // Env-overridable for the codegen A/B (SPARK_GRAFT_HUGE_LIMIT=65535
      // restores Spark's default ceiling).
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_LIMIT", "8000"))
      // the cartesian interlock is ON for every benched plan (mirrors
      // Verify): an unhinted cross join fails loudly at plan time.
      // SPARK_GRAFT_EXTENSIONS=none drops the injection entirely — the
      // knob exists to A/B the interlock's own planning cost
      .config("spark.sql.extensions",
        sys.env.getOrElse("SPARK_GRAFT_EXTENSIONS", "graft.GraftExtensions")
          match { case "none" => "" case e => e })
      .config(graft.plans.CartesianGuard.ConfKey,
        sys.env.getOrElse("SPARK_GRAFT_FAIL_CARTESIAN", "true"))
      // env-overridable for the streaming state-store A/B
      // (SPARK_GRAFT_STATESTORE=rocksdb swaps the provider for the
      // 19-query st family; default = Spark's HDFS-backed in-memory
      // provider)
      .config("spark.sql.streaming.stateStore.providerClass",
        sys.env.get("SPARK_GRAFT_STATESTORE") match {
          case Some("rocksdb") => "org.apache.spark.sql.execution." +
            "streaming.state.RocksDBStateStoreProvider"
          case Some(other) => other
          case None => "org.apache.spark.sql.execution.streaming." +
            "state.HDFSBackedStateStoreProvider"
        })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional filter for profiling: SPARK_GRAFT_ONLY=q1,q2
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(kv => only.contains(kv._1))
    // JVM/codegen/scan warmup outside the timed loop, then run in sorted
    // name order so per-query numbers are comparable across rounds
    try SparkEntry.queries.get("a02_grouped_agg")
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val names = selected.toSeq.sortBy(_._1)
    val loadBefore = systemLoad()
    val best = scala.collection.mutable.Map.empty[String, Double]
    // a thrown query must NOT record its time-to-throw as a result —
    // that turned 13 broken queries into fake sub-0.1s "wins" in r4.
    // Failures carry an err string into the JSON and fail the run.
    val errs = scala.collection.mutable.Map.empty[String, String]
    // CANARY (r8 verdict #1): the committed r8 record was taken on a
    // drifting host (A/A of identical code 1.13-1.16x apart), which
    // made 16 per-query "regressions" unadjudicable from artifacts
    // alone. A fixed reference query (a02) now runs at the start,
    // middle and end of EVERY rep pass; its samples ship in the JSON
    // so any cross-round comparison can divide host speed out
    // (time_r9/canary_r9 vs time_r8/canary_r8) and an intra-run drift
    // (canary spread) is visible without an A/A rerun.
    val canarySamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val canaryFn = SparkEntry.queries.get("a02_grouped_agg")
    def runCanary(): Unit = canaryFn.foreach { fn =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count()
        canarySamples += (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ACTION=force drives each query with
    // queryExecution.toRdd.count() instead of count(): count() lets
    // Catalyst PRUNE projected columns above the final aggregate
    // (the packing folds, the t33 Viterbi DP) and eliminate output
    // sorts, so fold-on-top-of-agg queries measure a lighter plan
    // (found r13 — SCALEPROBE section r13). The forced action
    // executes the DECLARED plan, every column, at InternalRow level
    // (no encoder overhead). Default stays count() so per-query
    // numbers remain comparable with every prior round's records;
    // the forced view is recorded separately in BENCHNOTES.
    val force = sys.env.get("SPARK_GRAFT_ACTION").contains("force")
    def drive(df: org.apache.spark.sql.DataFrame): Unit =
      if (force) df.queryExecution.toRdd.count() else df.count()
    val mid = names.size / 2
    for (_ <- 1 to reps) {
      runCanary()
      for (((name, fn), i) <- names.zipWithIndex) {
        if (i == mid && mid > 0) runCanary()
        // each pass evicts the previous pass's lazy caches so a rep
        // pays its own materialization, not a prior rep's
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          drive(fn(spark, sfDir))
          val sec = (System.nanoTime() - t0) / 1e9
          best.updateWith(name)(prev =>
            Some(prev.fold(sec)(math.min(_, sec))))
        } catch { case e: Throwable =>
          errs(name) = e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(200)
        }
      }
      runCanary()
    }
    def jstr(s: String): String = Jsons.quote(s)
    // value -1 marks a query with zero successful reps
    val results = names.map { case (k, _) => k -> best.getOrElse(k, -1.0) }
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val failed = names.map(_._1).filter(n => !best.contains(n))
    val errJson = failed.map(n => jstr(n) + ":" + jstr(errs(n)))
      .mkString("{", ",", "}")
    // a query that threw on SOME reps but succeeded on another still has
    // an honest best time, but the intermittent failure must be visible
    // — not silently discarded as it was pre-round-5
    val flaky = names.map(_._1)
      .filter(n => best.contains(n) && errs.contains(n))
    val flakyJson = flaky.map(n => jstr(n) + ":" + jstr(errs(n)))
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val canSorted = canarySamples.toSeq.sorted
    val canMedian = if (canSorted.isEmpty) -1.0
      else canSorted(canSorted.size / 2)
    // per-query times in canary units (raw / canary median): divide two
    // rounds' normalized values to compare code speed with host speed
    // factored out. Spread (max/min canary sample) flags intra-run drift.
    val canSpread = if (canSorted.isEmpty || canSorted.head <= 0) -1.0
      else math.rint(canSorted.last / canSorted.head * 1000) / 1000
    val qsNorm = results.map { case (k, v) =>
      jstr(k) + ":" + (if (v < 0 || canMedian <= 0) -1.0
        else math.rint(v / canMedian * 1000) / 1000)
    }.mkString("{", ",", "}")
    val canJson = canarySamples
      .map(v => math.rint(v * 1000) / 1000).mkString("[", ",", "]")
    // n_failed makes a shrunken headline total impossible to misread as
    // a clean run — failed queries carry -1 and are excluded from it
    val json = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},"n_failed":${failed.size},"queries":$qs,"canary_median":$canMedian,"canary_spread":$canSpread,"canary_samples":$canJson,"queries_norm":$qsNorm,"errors":$errJson,"flaky":$flakyJson,"sf":"$sfDir","reps":$reps,"load_avg_before":$loadBefore,"load_avg_after":${systemLoad()},"cpus":$cpus}"""
    println(json)
    // the driver's stdout capture can truncate a long tail, hiding
    // per-query regressions; persist the same JSON line to the repo
    // root as the machine-parsable record of this run. A filtered
    // profiling run (SPARK_GRAFT_ONLY) must NOT clobber the full-suite
    // record.
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_summary.json"), json + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] summary write failed: ${e.getMessage}")
      }
    spark.stop()
    flaky.foreach(n => System.err.println(s"[bench] FLAKY $n: ${errs(n)}"))
    if (failed.nonEmpty) {
      failed.foreach(n => System.err.println(s"[bench] FAILED $n: ${errs(n)}"))
      sys.exit(1)
    }
  }

  private def systemLoad(): Double = {
    val l = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    if (l < 0) 0.0 else math.rint(l * 100) / 100
  }
}
