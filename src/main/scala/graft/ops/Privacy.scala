package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for training-data releases — the set-level
  * companion to row-level PII redaction ([[TextAnalysis]]'s t05):
  * redaction strips direct identifiers, but a release is still
  * re-identifiable when a COMBINATION of quasi-identifiers (zip ×
  * birth date × gender in the classic Sweeney result; event type ×
  * hour-of-day here) isolates a small group.
  *
  *  - k-anonymity (Sweeney 2002): every quasi-identifier combination
  *    must describe ≥ k rows.
  *  - l-diversity (Machanavalli et al. 2007): within each combination,
  *    the SENSITIVE attribute must take ≥ l distinct values — a
  *    k-anonymous group whose members all share one sensitive value
  *    still leaks it.
  *
  * Shape: ONE grouped aggregation (count + distinct-count per group,
  * map-side partial for the count; the distinct-count shuffles
  * (group, sensitive) pairs) — group cardinality is the quasi-domain
  * product, bounded by construction, and nothing row-sized survives
  * the aggregation. No windows, no self-joins, no driver collects.
  */
object Privacy {

  /** Per quasi-identifier group: size `n`, distinct sensitive values
    * `ndv`, and the two violation flags. Null quasi values form their
    * own groups (a null zip code still isolates people); null
    * sensitive values do not count toward diversity
    * (`countDistinct` semantics).
    */
  def audit(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
            k: Long, l: Long, approx: Boolean = false): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    // exact ndv shuffles (group, sensitive) pairs (the expand plan);
    // approx = the 100-TB path — HLL++ sketches merge map-side at
    // constant memory, and at rsd 0.01 a group within ±2% of the l
    // bound deserves manual review anyway (the winsorize exact/approx
    // twin discipline: same plan shape, contract difference documented)
    val ndv =
      if (approx) approx_count_distinct(col(sensitiveCol), 0.01)
      else countDistinct(col(sensitiveCol))
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"), ndv.as("ndv"))
      .withColumn("k_violation", col("n") < k)
      .withColumn("l_violation", col("ndv") < l)
  }

  /** Only the groups that fail either bound — the worklist a release
    * gate suppresses or generalizes.
    */
  def violations(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Long, l: Long): DataFrame =
    audit(df, quasiCols, sensitiveCol, k, l)
      .filter(col("k_violation") || col("l_violation"))

  /** One-row release report: group totals, violating-group counts per
    * bound, and rows at risk (rows living in any violating group —
    * what suppression would delete).
    */
  def summary(df: DataFrame, quasiCols: Seq[String],
              sensitiveCol: String, k: Long, l: Long): DataFrame =
    audit(df, quasiCols, sensitiveCol, k, l).agg(
      count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_rows"),
      sum(when(col("k_violation"), 1L).otherwise(0L)).as("k_violations"),
      sum(when(col("l_violation"), 1L).otherwise(0L)).as("l_violations"),
      sum(when(col("k_violation") || col("l_violation"), col("n"))
        .otherwise(0L)).as("rows_at_risk"),
      min(col("n")).as("min_group"),
      min(col("ndv")).as("min_ndv"))
}
