package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** FUZZY LOOKUP under an edit-distance bound, Ed-Join style (Xiao,
    * Wang, Lin — "Ed-Join: an efficient algorithm for similarity joins
    * with edit distance constraints", VLDB 2008): find every corpus
    * string within `maxDist` edits of any probe string — the
    * typo-tolerant decontamination / blocklist sweep that exact-match
    * decontamination ([[Dedup.decontaminate]], d06/d09) misses when
    * the benchmark text was lightly mutated in the crawl.
    *
    * Blocking is the q-gram PREFIX FILTER, not first-char or suffix
    * heuristics (contrast [[corrections]]/[[resolveEntities]], whose
    * blocking is a documented *contract* on the noise model — this one
    * is exact): one edit changes the content of at most q overlapping
    * q-grams, so ed(a,b) ≤ τ implies the gram multisets share ≥
    * max(ga,gb) − qτ elements (Gravano et al.'s count filter), and two
    * multisets with that much overlap must collide within their first
    * qτ+1 grams under ANY shared total order (prefix principle —
    * occurrences are tagged (gram, occ) so the multiset argument holds
    * verbatim on sets). Ordering grams rarest-document-frequency-first
    * makes those collisions scarce; every candidate is then verified
    * with exact `levenshtein`, so the filter chain only prunes —
    * false negatives are impossible and the DuckDB oracle can state
    * the plain θ-join.
    *
    * Shape for 100 TB: NOTHING broadcasts and nothing is quadratic —
    * signature generation is one narrow pass per side (grams explode
    * q·|str| wide), the df table and the gram join are plain shuffle
    * joins on the gram key, and the verify set is |collisions|, driven
    * toward |true matches| by the rarest-first order. Corpus rows
    * never meet each other; cost is independent of |corpus|² even when
    * both sides are huge.
    *
    * Contract: strings shorter than q·(τ+1) have no usable count bound
    * (max(ga,gb) − qτ ≤ 0) and are excluded from BOTH sides — callers
    * wanting short-string matching should compare those directly.
    *
    * Output: (probe_id, corpus_id, dist) for every pair with
    * `levenshtein ≤ maxDist`.
    */
  def editDistanceLookup(corpus: DataFrame, idCol: String, strCol: String,
                         probes: DataFrame, pidCol: String, pstrCol: String,
                         maxDist: Int, q: Int = 3): DataFrame =
    editDistanceLookupImpl(corpus, idCol, strCol, probes, pidCol, pstrCol,
      maxDist, q, persist = false).df

  /** [[editDistanceLookup]] with the corpus gram/document-frequency
    * frames persisted (they are read by both join sides) and handed
    * back for release — the form the bench queries run. The plain form
    * above is unhinted: leak-free, at the cost of recomputing the gram
    * explode per consumer.
    */
  def editDistanceLookupCached(corpus: DataFrame, idCol: String,
                               strCol: String, probes: DataFrame,
                               pidCol: String, pstrCol: String,
                               maxDist: Int, q: Int = 3): Cached =
    editDistanceLookupImpl(corpus, idCol, strCol, probes, pidCol, pstrCol,
      maxDist, q, persist = true)

  private def editDistanceLookupImpl(
      corpus: DataFrame, idCol: String, strCol: String,
      probes: DataFrame, pidCol: String, pstrCol: String,
      maxDist: Int, q: Int, persist: Boolean): Cached = {
    require(maxDist >= 1 && q >= 2, "maxDist >= 1 and q >= 2")
    val minLen = q * (maxDist + 1)
    val k = q * maxDist + 1
    // ids keep their caller type (a cast-to-long would silently null
    // string ids and collapse the result to empty — the corrections/
    // resolveEntities convention)
    val c = corpus.select(col(idCol).as("sid"),
        col(strCol).cast("string").as("s"))
      .filter(col("sid").isNotNull && length(col("s")) >= minLen)
    val p = probes.select(col(pidCol).as("sid"),
        col(pstrCol).cast("string").as("s"))
      .filter(col("sid").isNotNull && length(col("s")) >= minLen)

    // (sid, gram, occ, pos): positional q-grams, occurrences tagged so
    // duplicate grams stay distinct multiset elements.
    def grams(side: DataFrame): DataFrame = {
      val g = side
        .withColumn("pos",
          explode(sequence(lit(1), length(col("s")) - (q - 1))))
        .withColumn("gram", col("s").substr(col("pos"), lit(q)))
      g.withColumn("occ",
        row_number().over(Window.partitionBy("sid", "gram").orderBy("pos")))
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(d: DataFrame): DataFrame =
      if (persist) { val p = d.persist(lvl); pinned += p; p } else d
    // corpus grams feed both the df table and the corpus prefix; dfreq
    // joins against BOTH sides' grams — pinned once in the Cached form
    val cGrams = pin(grams(c))
    // Document frequency over the CORPUS defines the shared total order
    // (dfreq asc, gram, occ) — rarest first. Probe grams absent from
    // the corpus keep dfreq 0: sound (they sort first, and an absent
    // gram can never collide anyway).
    val dfreq = pin(cGrams.select(col("sid"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("dfreq")))
    def prefix(g: DataFrame): DataFrame =
      g.join(dfreq, Seq("gram"), "left")
        .na.fill(0L, Seq("dfreq"))
        .groupBy(col("sid"))
        .agg(slice(sort_array(collect_list(
            struct(col("dfreq"), col("gram"), col("occ")))), 1, k)
          .as("pref"))
        .select(col("sid"), explode(col("pref")).as("pr"))
        .select(col("sid"), col("pr.gram").as("gram"),
          col("pr.occ").as("occ"))

    val cand = prefix(grams(p)).as("pp")
      .join(prefix(cGrams).as("cp"), Seq("gram", "occ"))
      .select(col("pp.sid").as("probe_id"), col("cp.sid").as("corpus_id"))
      .distinct()
    val out = cand
      .join(p.select(col("sid").as("probe_id"), col("s").as("ps")),
        Seq("probe_id"))
      .join(c.select(col("sid").as("corpus_id"), col("s").as("cs")),
        Seq("corpus_id"))
      .filter(abs(length(col("ps")) - length(col("cs"))) <= maxDist)
      // one DP evaluation per candidate: compute, then filter on it
      .withColumn("dist",
        levenshtein(col("ps"), col("cs")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("probe_id"), col("corpus_id"), col("dist"))
    Cached(out, pinned.toSeq)
  }
}
