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
      // Single-partition layout: MLlib's iterative jobs (LR epochs, one
      // job per RF/GBT tree depth) each schedule one task instead of
      // 32, and every shuffle collapses to one reducer — on 2k rows the
      // work is microseconds, the scheduling is the cost. No AQE (per-
      // stage replanning dominates). Whole-stage codegen STAYS ON:
      // measured A/B at sf0.1, disabling it regressed 9.1s → 18.5s —
      // MLlib's transform/eval stages repeat enough that the compiled
      // code pays for its janino compile even on tiny data. All
      // restored after; this block documents the SMALL-data stance —
      // the 100 TB stance is the inverse (wide partitions).
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
      s.conf.set("spark.sql.shuffle.partitions", "1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val raw = TransactionGen.batch(s, 2000, seed = 42, partitions = 1)
        TrainingJob.run(raw, outDir = None, fast = true)
          .metrics
          .select(col("model"), round(col("accuracy"), 2).as("accuracy"),
            round(col("roc_auc"), 4).as("roc_auc"),
            round(col("matthews_corrcoef"), 4).as("mcc"))
          .orderBy(col("model"))
          .localCheckpoint(true) // materialize under the tuned confs
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }),

    // Isotonic (PAVA) probability calibration over the lineitem-derived
    // scored frame: calibrated probabilities per raw-probability band,
    // plus the calibration diagnostics before/after. MLlib fit →
    // rows-only; monotonicity + identity-on-calibrated-input are
    // spec'd in MLSpec.
    "m13_isotonic" -> ((s, d) => {
      val scored = Tables.lineitem(s, d)
        .select((col("l_returnflag") === "R").cast("int").as("label"),
          (col("l_discount") * 9 + col("l_tax")).as("proba"))
      graft.ml.Models.isotonicCalibrate(scored, "label", "proba")
        .groupBy(floor(col("proba") * 10).cast("int").as("band"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("calibrated")), 6).as("avg_calibrated"),
          round(avg(col("label")), 6).as("empirical"))
        .orderBy(col("band"))
    })
  )

  def oracle: Map[String, String] = Map()
}
