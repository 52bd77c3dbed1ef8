package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins upsert compaction — the incremental-refresh
  * primitive of a large corpus pipeline: fold a change-set (new and
  * re-crawled documents, plus delete tombstones) into the standing
  * snapshot, keeping exactly one live row per key.
  *
  * Plan shape: `union` (no shuffle) → one hash aggregation on the key
  * with a `max_by(struct(row), struct(version, origin))` payload —
  * max_by partials combine map-side, so the shuffle carries one
  * candidate row per (key, map partition), not the full change history.
  * Contrast a MERGE-style join, which shuffles BOTH full inputs and
  * still needs a second pass for keys only in one side. With snapshot
  * and changes bucketed on the key the single exchange disappears
  * entirely (see [[Layout.bucketJoin]] for the layout contract).
  */
object Upsert {

  /** Merge `changes` into `snapshot`, one surviving row per key.
    *
    * Both frames must share the snapshot's schema. The winner per key is
    * the row with the highest `versionCol`; on a version tie a change
    * row beats a snapshot row (re-delivered batches stay idempotent).
    * Rows whose winning version has `deletedCol = true` are dropped —
    * the tombstone consumes the key. Ties within `changes` itself are
    * broken arbitrarily; feed a total (version, origin) order when the
    * change stream can re-key within one version.
    */
  def compact(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
              versionCol: String,
              deletedCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val cols = snapshot.columns.toSeq
    require(changes.columns.toSeq == cols,
      s"changes schema ${changes.columns.toSeq} != snapshot schema $cols")
    val all = snapshot.withColumn("__origin", lit(0))
      .unionByName(changes.withColumn("__origin", lit(1)))
    all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(versionCol), col("__origin"))).as("__winner"))
      .select(col("__winner.*"))
      .filter(deletedCol.map(d => !coalesce(col(d), lit(false)))
        .getOrElse(lit(true)))
  }

  /** Type-2 slowly-changing-dimension history from a change log: per
    * key ordered by `versionCol`, each change row opens a validity
    * interval that the NEXT change closes (`valid_to` null = the
    * current row) — the standard warehouse history layout, and the
    * snapshot-at-version query primitive (`valid_from ≤ v < valid_to`).
    *
    * One `lead` window per key: parallel across keys, no self-join
    * (the naive interval build joins the change log to itself on
    * key + next-version — a second full shuffle for what the window's
    * single partition pass already knows).
    *
    * `versionCol` must be unique per key: with duplicate versions the
    * lead order among the ties — and therefore which duplicate closes
    * the interval — is not deterministic. Run [[compact]] (or dedup on
    * (key, version)) first when the change stream can re-deliver.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String],
           versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Mergeable per-key aggregate STATE `(keys…, n, sum_v, min_v,
    * max_v)` over an integer-valued column — the materialized-view
    * building block of [[mergeAggState]]. The sum accumulates as
    * DECIMAL(38,0) so a 100-TB key's cents never overflow and
    * partition order cannot smear bits.
    */
  def aggState(rows: DataFrame, keyCols: Seq[String],
               valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val v = col(valueCol)
    rows.filter(v.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(v.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("sum_v"),
        min(v).as("min_v"), max(v).as("max_v"))
  }

  /** INCREMENTAL VIEW MAINTENANCE for a grouped aggregate: fold a
    * delta's [[aggState]] into the standing state without touching the
    * already-aggregated history — the refresh a 100-TB rollup wants
    * (re-aggregate the day's delta, merge states; never rescan the
    * exabyte of settled partitions). count/sum/min/max are all
    * mergeable, so the merge is a union + ONE map-side-combinable
    * grouped aggregation; with both state tables bucketed on the key
    * even that exchange disappears ([[Layout.writeBucketed]]).
    *
    * Insert-only deltas by contract: min/max are not invertible, so
    * retractions require recomputing the affected keys (the standard
    * IVM limitation); counts/sums alone could subtract, but this op
    * keeps one uniform contract. The defining invariant —
    * `mergeAggState(aggState(a), aggState(b)) ≡ aggState(a ∪ b)` — is
    * what the u04 oracle states (merged state vs full recompute).
    */
  def mergeAggState(state: DataFrame, deltaState: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    state.unionByName(deltaState)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Corpus snapshot diff: classify every id across two snapshots as
    * `added` / `removed` / `changed` / `unchanged` by content digest —
    * the audit between crawl snapshots that decides what to re-embed,
    * re-tokenize, or re-index downstream. ONE full outer join on the
    * id; content compares as md5 digests computed inside each side's
    * scan, so the join carries 32-byte digests (never document text)
    * and the comparison after the exchange is a fixed-width equality.
    * A null `contentCol` digests to null: null vs null compares
    * `unchanged` (null-safe equality), null vs text `changed`.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol),
      md5(col(contentCol).cast("binary")).as("__old"))
    val n = newSnap.select(col(idCol),
      md5(col(contentCol).cast("binary")).as("__new"))
    o.withColumn("__in_old", lit(1))
      .join(n.withColumn("__in_new", lit(1)), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__old") <=> col("__new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
