package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised categorical encodings for model features (beyond the
  * reference surface — its pipeline label-encodes categories by
  * alphabetical index, `ml/FeaturePipeline`; target statistics are
  * the higher-capacity standard for tree/linear models on
  * high-cardinality categoricals).
  *
  * Smoothed target encoding (Micci-Barreca 2001):
  * `te(c) = (Σ y_c + m·μ) / (n_c + m)` — the category's label mean
  * shrunk toward the global prior μ by pseudo-count m, so rare
  * categories don't memorize their few labels.
  *
  * Leave-one-out variant: each ROW's encoding excludes its own label,
  * `loo_i = (Σ y_c − y_i) / (n_c − 1)` — the leakage-safe form for
  * training folds (a row never sees itself); singleton categories get
  * null (nothing to borrow).
  *
  * Scale shape: one grouped aggregation over (category) plus a
  * broadcast of the category stats back onto the rows — no window, no
  * shuffle of the fact table beyond the stats agg. All numerators are
  * exact integer sums and every division is spelled identically in
  * the oracle, so the encoded doubles hash-match cross-engine.
  */
object Encodings {

  /** Per-row frame with `te` (smoothed) and `loo` (leave-one-out)
    * target-encoding columns appended. `labelCol` must be integral
    * 0/1 (cast upstream); null categories form their own group, the
    * grouped-agg semantics.
    */
  def targetEncode(df: DataFrame, catCol: String, labelCol: String,
                   m: Int = 20): DataFrame = {
    require(m >= 0, s"pseudo-count m must be >= 0, got $m")
    val rows = df.withColumn("__y", col(labelCol).cast("long"))
    val stats = rows.groupBy(col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n_c"), sum(col("__y")).as("__sum_c"))
    val glob = rows.agg(count(lit(1)).as("__n"), sum(col("__y")).as("__sum"))
    rows
      .join(broadcast(stats), col(catCol) <=> col("__cat"))
      .crossJoin(broadcast(glob))
      .withColumn("te",
        (col("__sum_c").cast("double")
          + lit(m.toDouble)
            * (col("__sum").cast("double") / col("__n").cast("double")))
          / (col("__n_c").cast("double") + lit(m.toDouble)))
      .withColumn("loo",
        when(col("__n_c") > 1,
          (col("__sum_c") - col("__y")).cast("double")
            / (col("__n_c") - 1).cast("double")))
      .drop("__cat", "__n_c", "__sum_c", "__n", "__sum", "__y")
  }
}
