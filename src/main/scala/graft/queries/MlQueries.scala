package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TransactionGen
import graft.ml.TrainingJob

/** ML-pipeline coverage — SURVEY §2.5 M1-M12 as a driver-visible query.
  * Not DuckDB-expressible (MLlib estimators) — rows-only check; the
  * semantics are asserted in MLSpec against hand-computed fixtures.
  */
object MlQueries extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1-M12 end-to-end: preprocess → encode/assemble/scale → balance →
    // split → LR/RF/GBT → metric battery. Returns the model_metrics
    // frame (3 rows). Deterministic input via the seeded generator.
    "m12_train_metrics" -> ((s, _) => {
      // 4 partitions: MLlib iterations schedule per-partition tasks, and
      // 32-way parallelism on 2k rows is pure scheduler overhead. Small
      // shuffle width + no AQE for the same reason — dozens of tiny
      // stages where per-stage replanning dominates. Restored after.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val raw = TransactionGen.batch(s, 2000, seed = 42, partitions = 4)
        TrainingJob.run(raw, outDir = None, fast = true)
          .metrics
          .select(col("model"), round(col("accuracy"), 2).as("accuracy"),
            round(col("roc_auc"), 4).as("roc_auc"),
            round(col("matthews_corrcoef"), 4).as("mcc"))
          .orderBy(col("model"))
          .cache() // materialize under the tuned confs
          .localCheckpoint(true)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    })
  )

  def oracle: Map[String, String] = Map()
}
