package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality contracts — the "expectation suite" every
  * ingestion boundary runs (range bounds, null policies, domain
  * membership, cross-field invariants) as data, not as assertions
  * scattered through code.
  *
  * Every rule is a row-level Column predicate and ALL rules evaluate
  * in ONE aggregation pass (conditional sums in a single `agg`, then a
  * scan-free unpivot of the one-row result) — never one job per rule,
  * the difference between a contract suite that costs one table scan
  * and one that costs |rules| scans at 100 TB.
  *
  * Three-valued-logic stance: a predicate evaluating to NULL (null
  * operand in a comparison) counts as a VIOLATION — "unknown" is not
  * "pass" at a data contract. Set-level rules (uniqueness, referential
  * integrity) are deliberately out of scope here: they are joins/
  * aggregations with their own scan shapes ([[Dedup.exactGroups]],
  * anti-joins), not row predicates.
  */
object Expectations {

  /** Evaluate all `rules` in one pass. Output: one row per rule —
    * (rule, violations, n_rows, pass).
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation")
    require(rules.map(_._1).distinct.size == rules.size,
      "expectation names must be unique")
    val aggs = count(lit(1)).as("__total") +: rules.map { case (n, p) =>
      sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(s"__v_$n")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__total").as("n_rows"),
        explode(array(rules.map { case (n, _) =>
          struct(lit(n).as("rule"), col(s"__v_$n").as("violations"))
        }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("n_rows"), (col("r.violations") === 0L).as("pass"))
  }
}
