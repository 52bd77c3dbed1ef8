package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked approximate-string matching — the spell-correction /
  * entity-resolution join a curation pipeline runs over OCR'd or
  * noisy crawl text (beyond the reference surface; the reference
  * normalizes keys only by exact lower/underscore rewriting,
  * `FD/consumer.py:31`).
  *
  * Shape for 100 TB: the dictionary side is small (a vocabulary, a
  * catalog, a gazetteer) and BROADCASTS; the corpus side reduces to
  * its DISTINCT out-of-vocabulary terms before any matching, so the
  * expensive edit-distance work is O(|terms| × |block|), independent
  * of corpus row count, and the corpus itself is never shuffled —
  * corrections join back by another broadcast.
  *
  * Candidate blocking: equal first character + length within
  * `maxDist` (both are necessary conditions for `levenshtein ≤
  * maxDist` when the first character is preserved, which typo noise
  * overwhelmingly does — and the contract this op documents). The
  * first-char equality gives the broadcast join a hash key, so the
  * plan is a BroadcastHashJoin with the length/distance predicates as
  * post-join filters, not a nested loop over the cross product.
  */
object FuzzyJoin {

  /** Best correction per distinct term: join `terms` to `vocab`
    * within edit distance `maxDist` (blocked as documented above) and
    * keep the (distance, candidate)-lexicographic minimum — ties
    * break alphabetically, deterministically. Terms with no candidate
    * in range are absent from the output (unmatched = uncorrectable).
    *
    * Output: (term, corrected, dist).
    */
  def corrections(terms: DataFrame, termCol: String,
                  vocab: DataFrame, vocabCol: String,
                  maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val t = terms.select(col(termCol).cast("string").as("term")).distinct()
    val v = vocab.select(col(vocabCol).cast("string").as("cand")).distinct()
    t.join(broadcast(v),
        substring(col("term"), 1, 1) === substring(col("cand"), 1, 1) &&
          abs(length(col("term")) - length(col("cand"))) <= maxDist &&
          levenshtein(col("term"), col("cand")) <= maxDist)
      .groupBy(col("term"))
      .agg(min_by(col("cand"),
          struct(levenshtein(col("term"), col("cand")), col("cand")))
        .as("corrected"))
      .withColumn("dist",
        levenshtein(col("term"), col("corrected")).cast("long"))
  }

  /** ENTITY RESOLUTION: cluster near-identical name strings into
    * canonical entities — the record-linkage pass that deduplicates
    * "Acme Corp" / "Acme Corp." / "cme Corp" rows before any
    * entity-keyed aggregation. Classic blocked shape:
    *
    *  1. block on the lowercased name's last `blockChars` characters
    *     (typo noise concentrates at word starts — OCR drops, case,
    *     honorifics — so a SUFFIX key survives the mutations a prefix
    *     key would split; pair cost is Σ blockSize², bounded by the
    *     key's selectivity, never n²);
    *  2. verify candidates with the exact predicate (length delta
    *     pre-filter, then `levenshtein ≤ maxDist` — the pre-filter is
    *     a necessary condition, so it only prunes);
    *  3. transitive closure over match pairs
    *     ([[Dedup.connectedComponents]] min-label fixpoint) — A~B and
    *     B~C bind A,C to one entity even at distance 2·maxDist, the
    *     semantics record linkage wants;
    *  4. every input row maps to `entity_id` = min id of its
    *     component; unmatched rows map to themselves (total mapping).
    *
    * Output: (id, name, entity_id). Every stage is engine-portable
    * (levenshtein is exact integer), so the d15 oracle replays
    * blocking, verification, AND the closure in DuckDB.
    */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
                      blockChars: Int = 8, maxDist: Int = 2): DataFrame = {
    require(blockChars >= 1 && maxDist >= 1, "blockChars and maxDist >= 1")
    val rows = df.select(col(idCol).cast("long").as("id"),
      lower(col(nameCol)).cast("string").as("name"))
    val keyed = rows.withColumn("bk",
      expr(s"right(name, $blockChars)"))
    val pairs = keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id") &&
          abs(length(col("a.name")) - length(col("b.name"))) <= maxDist &&
          levenshtein(col("a.name"), col("b.name")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id"), col("component"))
    rows.join(comps, Seq("id"), "left")
      .select(col("id"), col("name"),
        coalesce(col("component"), col("id")).as("entity_id"))
  }
}
