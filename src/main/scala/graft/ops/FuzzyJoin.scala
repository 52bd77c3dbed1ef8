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
}
