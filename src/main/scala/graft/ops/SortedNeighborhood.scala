package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pass sorted-neighborhood blocking (Hernández & Stolfo 1995,
  * "The merge/purge problem for large databases") — the OTHER classic
  * entity-resolution candidate generator next to prefix-filter
  * blocking ([[FuzzyJoin.resolveEntities]], d15): sort the corpus by a
  * derived blocking key, slide a window of `w` positions, and pair
  * every two rows that fall within the same window. Typos at the
  * START of a key teleport a record far away in one sort order, which
  * is exactly why the 1995 paper prescribes MULTIPLE passes with
  * independent keys (here e.g. the key and its reverse) whose
  * candidate sets union.
  *
  * Scale shape: no global sort is ever materialized and no
  * single-partition window runs. A row's global position comes from
  * [[Aggregates.bucketedPrefixSums]] — bucket by a numeric key proxy,
  * per-bucket parallel `row_number`, tiny offsets frame — and the
  * window pairing is an EQUI-join on `(pos-1) div w` blocks (the probe
  * side exploded to its own and previous block), so the whole pipeline
  * is scan → bucketed rank → one shuffle on block id. Candidate volume
  * is ≤ n·(w−1) by construction, never quadratic.
  *
  * Cross-engine determinism: the sort key is packed into ONE BIGINT —
  * the first `prefixChars` characters' codepoints (mod 128, 7 bits
  * each, space-padded) concatenated above `idBits` bits of the row id
  * — so any SQL engine replays the identical total order with integer
  * algebra; no string-collation dependence anywhere. Non-ASCII
  * codepoints fold mod 128: deterministic on both sides, costs only
  * blocking quality (a fold collision can merge two key neighborhoods,
  * never diverge engines). One caveat the packing cannot absorb: a
  * DERIVED key built with an engine's `reverse()` (the classic second
  * pass) is only cross-engine deterministic when every grapheme is a
  * single codepoint — Spark reverses codepoints, DuckDB reverses
  * grapheme clusters, so a combining sequence reorders differently
  * BEFORE the key ever packs. Pre-fold such keys to ASCII (drop
  * non-ASCII codepoints) before reversing, as the d21 driver query
  * does.
  *
  * Reference capability: merge/purge over noisy customer identities —
  * the dedup the reference's synthetic customers would need at corpus
  * scale (`FD/producer.py:59-77` generates unnormalized identity
  * fields; `FD/model.py:51` drops exact duplicates only).
  */
object SortedNeighborhood {

  /** The packed BIGINT sort key (see class doc): 7 bits per prefix
    * char above `idBits` bits of id. Pure column algebra — the oracle
    * replays it with ascii/substr/mod. Requires 7·prefixChars + idBits
    * ≤ 62 and 0 ≤ id < 2^idBits (checked at runtime by [[positions]]).
    */
  def packedKey(key: Column, id: Column, prefixChars: Int,
                idBits: Int): Column = {
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars in [1,8], got $prefixChars")
    require(idBits >= 1 && 7 * prefixChars + idBits <= 62,
      s"7*prefixChars + idBits must be <= 62, got ${7 * prefixChars + idBits}")
    val padded = rpad(key, prefixChars, " ")
    val prefixNum = (1 to prefixChars).map { i =>
      pmod(ascii(substring(padded, i, 1)).cast("long"), lit(128L))
    }.reduce((acc, c) => acc * 128L + c)
    prefixNum * (1L << idBits) + id
  }

  /** Adds `pos` (1-based global rank in packed-key order) and `blk`
    * (`(pos-1) div w`) to `df`. The packed key must be UNIQUE — ids
    * unique and in [0, 2^idBits) guarantee that; BOTH halves of the
    * contract are checked loudly here (ADVICE r11: a duplicate id
    * would give two rows the same packed key, and the within-bucket
    * prefix-sum rank would then order the tie arbitrarily — a silent
    * cross-engine divergence, not a loud failure).
    */
  def positions(df: DataFrame, keyCol: Column, idCol: String, w: Int,
                prefixChars: Int = 5, idBits: Int = 21): DataFrame = {
    require(w >= 2, s"window w must be >= 2, got $w")
    val keyed = df
      .withColumn("__snkey", packedKey(keyCol, col(idCol), prefixChars, idBits))
      .withColumn("__one", lit(1L))
    // loud contract check, ONE aggregation: ids in range (key packing
    // assumes it — an out-of-range id would alias another prefix) AND
    // ids distinct (exact count_distinct; the ranking below is a full
    // shuffle of the same frame, so the check never dominates)
    val chk = keyed.agg(count(lit(1)).as("__n"),
      count_distinct(col(idCol)).as("__nd"),
      min(col(idCol).cast("long")).as("__mn"),
      max(col(idCol).cast("long")).as("__mx")).head()
    val (n, nd) = (chk.getLong(0), chk.getLong(1))
    require(n == nd,
      s"$idCol must be unique for sorted-neighborhood key packing: " +
        s"$n rows but $nd distinct ids")
    require(n == 0L ||
      (chk.getLong(2) >= 0L && chk.getLong(3) < (1L << idBits)),
      s"$idCol must lie in [0, 2^$idBits) for sorted-neighborhood key packing")
    Aggregates.bucketedPrefixSums(keyed, "__snkey", ascending = true,
        sumCols = Seq("__one"))
      .withColumn("pos", col("cum___one"))
      // integer div (not `/`, which is double division past 2^53)
      .withColumn("blk", expr(s"(pos - 1) div $w"))
      .drop("__snkey", "__one", "cum___one")
  }

  /** One blocking pass: every unordered pair of rows whose positions
    * in `keyCol` order differ by < `w`. Output columns: `id_a`,
    * `id_b` (= the two `idCol` values, position order), `gap`
    * (position distance, 1..w−1).
    */
  def candidates(df: DataFrame, keyCol: Column, idCol: String, w: Int,
                 prefixChars: Int = 5, idBits: Int = 21): DataFrame = {
    val posDf = positions(df, keyCol, idCol, w, prefixChars, idBits)
      .select(col(idCol), col("pos"), col("blk"))
    val left = posDf.select(col(idCol).as("id_a"),
      col("pos").as("pos_a"), col("blk"))
    val probe = posDf.select(col(idCol).as("id_b"), col("pos").as("pos_b"),
      explode(array(col("blk"), col("blk") - 1L)).as("blk"))
    left.join(probe, Seq("blk"))
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") - col("pos_a") < w)
      .select(col("id_a"), col("id_b"),
        (col("pos_b") - col("pos_a")).as("gap"))
  }

  /** The Hernández–Stolfo multi-pass union: one [[candidates]] pass
    * per blocking key, pairs canonicalized (id_a < id_b) and
    * deduplicated, with one boolean column per pass recording which
    * sort order(s) surfaced the pair. `keys` maps pass name →
    * blocking-key column; pass names become `found_<name>` columns.
    */
  def multiPass(df: DataFrame, idCol: String, keys: Seq[(String, Column)],
                w: Int, prefixChars: Int = 5,
                idBits: Int = 21): DataFrame = {
    require(keys.nonEmpty, "at least one blocking pass")
    val passes = keys.map { case (name, k) =>
      candidates(df, k, idCol, w, prefixChars, idBits)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          lit(name).as("__pass"))
    }
    val all = passes.reduce(_ unionByName _)
    val flags = keys.map { case (name, _) =>
      max(when(col("__pass") === name, true)
        .otherwise(false)).as(s"found_$name")
    }
    all.groupBy(col("id_a"), col("id_b")).agg(flags.head, flags.tail: _*)
  }
}
