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

  /** REFERENTIAL-INTEGRITY audit: one row per declared foreign key —
    * total child rows, non-null keys, and ORPHANS (non-null keys with
    * no parent). The join-safety check a warehouse runs before
    * trusting any fact-to-dimension join: orphans silently vanish
    * from inner joins and null out enrichments, and neither failure
    * mode raises an error on its own.
    *
    * Shape: parent keys dedupe once, the child LEFT-joins them and
    * one map-side-combinable agg counts — no row-level output, so the
    * audit costs a semi-join regardless of child size. Null child
    * keys are reported separately (a null FK is a modeling choice;
    * an orphan is corruption).
    */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
                parentKey: String, relation: String): DataFrame = {
    val par = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(childKey).as("__k"))
      .join(par, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__k").isNotNull, 1L).otherwise(0L))
          .as("n_nonnull"),
        sum(when(col("__k").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)).as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_rows"),
        col("n_nonnull"), col("n_orphans"))
  }

  /** Evaluate all `rules` in one pass. Output: one row per rule —
    * (rule, violations, n_rows, pass).
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation")
    require(rules.map(_._1).distinct.size == rules.size,
      "expectation names must be unique")
    // internal columns key by rule INDEX, not name — a rule named
    // "price.positive" (dots, backticks, spaces are all legal in a
    // human-readable rule name) must not have to survive a round-trip
    // through column-identifier parsing; the name only ever appears
    // as a string literal in the output struct
    val aggs = count(lit(1)).as("__total") +:
      rules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(s"__v_$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__total").as("n_rows"),
        explode(array(rules.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).as("rule"), col(s"__v_$i").as("violations"))
        }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("n_rows"), (col("r.violations") === 0L).as("pass"))
  }
}
