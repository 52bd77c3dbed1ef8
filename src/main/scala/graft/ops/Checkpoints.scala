package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative operators (connected components, BFS,
  * PageRank, SMOTE's hull walk): each iteration's result must
  * materialize — a non-truncated plan towers into an
  * exponentially-reanalyzed tree — but HOW it materializes is a
  * fault-tolerance choice:
  *
  *  - `localCheckpoint(eager = true)` (the default) stores partition
  *    blocks in executor memory/disk and DISCARDS lineage. Fast and
  *    fine on `local[*]`, but on a cluster a lost executor loses
  *    blocks that can no longer be recomputed — the job dies instead
  *    of recovering. (Spark docs flag exactly this trade.)
  *  - `checkpoint(eager = true)` writes partitions to the reliable
  *    checkpoint directory (HDFS/object store at scale); executor
  *    loss recovers by re-reading — the right mode for the
  *    1000-executor target where some executor WILL be lost mid-run.
  *
  * Flag-gated like `spark.graft.diagnostics`: set
  * `spark.graft.checkpointDir` to a durable path to switch every
  * iterative op to reliable checkpoints; unset keeps the local fast
  * path. Both modes are eager, so callers can keep piggybacking
  * convergence probes (`head(1)`) on the already-materialized result
  * without scheduling an extra job.
  *
  * Disk note: Spark does NOT delete reliable checkpoint files when the
  * frame goes out of scope (only
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` reclaims
  * them at GC time, best-effort). Production jobs should point the flag
  * at a per-run directory and remove it after the job — the same
  * lifecycle as a streaming checkpoint location.
  */
object Checkpoints {
  val ConfKey = "spark.graft.checkpointDir"

  // setCheckpointDir mints a fresh UUID subdir per call, so compare
  // against the last flag value we applied, not getCheckpointDir —
  // keyed to the live SparkContext: a cache that outlived a stopped
  // context would skip setCheckpointDir on its successor and
  // checkpoint() would throw "directory has not been set"
  @volatile private var applied: (org.apache.spark.SparkContext, String) =
    null

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (applied == null || applied._1 != sc || applied._2 != dir)
          synchronized {
            if (applied == null || applied._1 != sc || applied._2 != dir) {
              sc.setCheckpointDir(dir)
              applied = (sc, dir)
            }
          }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
