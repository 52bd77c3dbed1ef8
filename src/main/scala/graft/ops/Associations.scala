package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the co-purchase / co-occurrence
  * lift screen (Agrawal & Srikant's Apriori frequent-pair core, VLDB
  * 1994) that turns transaction baskets into `a → b` rules ranked by
  * lift. Beyond the reference surface (the reference aggregates single
  * columns only); in a training-data pipeline the same operator scores
  * tag/source co-occurrence for mixture design.
  *
  * Everything is integer counting until the final rule arithmetic, so
  * the whole chain sits on a hash-exact oracle:
  *
  *  1. baskets dedupe to DISTINCT (basket, item);
  *  2. baskets larger than `maxBasket` items are DROPPED — the classic
  *     preprocessing guard (a pathological 10⁴-item basket alone would
  *     contribute 5·10⁷ pairs); part of the operator's semantics, so
  *     the oracle replays it and support denominators count only the
  *     kept baskets;
  *  3. items below the support floor are pruned BEFORE pairing — by
  *     the Apriori property a pair can never out-support its items, so
  *     this prunes without changing the answer (the oracle therefore
  *     states plain pair counts with a HAVING floor);
  *  4. per-basket self-join (item_a < item_b) counts pair support;
  *     bounded by maxBasket²/2 per basket, never |items|²;
  *  5. rules: confidence both ways + lift, fixed-order double
  *     divisions over the exact counts, 7dp-rounded.
  *
  * Support floor: `minPctNum/minPctDen` as an integer cross-multiply
  * (`den·count >= num·N`) — no float thresholds, engine-portable.
  *
  * Scale shape: two grouped counts, one semi-join, one equi-self-join
  * on the basket key, all map-side-combinable; the only broadcast is
  * the 1-row basket total. Item vocabulary and basket cardinality are
  * both unbounded.
  */
object Associations {

  /** Frequent-pair association rules over `(basketCol, itemCol)` rows.
    * Output per qualifying pair (support ≥ minPctNum/minPctDen of kept
    * baskets, item_a < item_b): `(item_a, item_b, n_a, n_b, n_pair,
    * conf_ab, conf_ba, lift)`.
    *
    * UNHINTED plan — no persist, so intermediate frames recompute per
    * consumer subtree (the distinct scan runs up to three times).
    * Correct at any scale and leak-free for library callers; pipelines
    * that will consume the result once should use [[rulesCached]] and
    * `release()` after the action (the `robustZscorePerGroupCached`
    * convention).
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minPctNum: Long = 1L, minPctDen: Long = 100L,
            maxBasket: Int = 12): DataFrame =
    rulesImpl(df, basketCol, itemCol, minPctNum, minPctDen, maxBasket,
      persist = false).df

  /** [[rules]] with the multiply-read intermediates persisted and
    * handed back for release — the form the bench queries run.
    */
  def rulesCached(df: DataFrame, basketCol: String, itemCol: String,
                  minPctNum: Long = 1L, minPctDen: Long = 100L,
                  maxBasket: Int = 12): Cached =
    rulesImpl(df, basketCol, itemCol, minPctNum, minPctDen, maxBasket,
      persist = true)

  private def rulesImpl(df: DataFrame, basketCol: String, itemCol: String,
                        minPctNum: Long, minPctDen: Long, maxBasket: Int,
                        persist: Boolean): Cached = {
    require(minPctNum >= 1 && minPctDen >= minPctNum && maxBasket >= 2,
      "support floor must be a positive fraction and maxBasket >= 2")
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(d: DataFrame): DataFrame =
      if (persist) {
        val p = d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinned += p; p
      } else d
    val items = pin(df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct())
    // one basket-size agg serves both the size guard and the basket
    // total — no second distinct pass over the item rows
    val sizesOk = pin(items.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBasket).select(col("__bk")))
    // kept feeds the item supports and both sides of the pair self-join
    val kept = pin(items.join(sizesOk, Seq("__bk"), "left_semi"))
    val nBaskets = sizesOk.agg(count(lit(1)).as("__nb"))
    val supp = kept.groupBy(col("__it")).agg(count(lit(1)).as("__cnt"))
    val freq = supp
      .crossJoin(broadcast(nBaskets))
      .filter(col("__cnt") * minPctDen >= col("__nb") * minPctNum)
      .select(col("__it"), col("__cnt"))
    val fitems = pin(kept.join(freq.select(col("__it")), Seq("__it"),
      "left_semi"))
    val pairs = fitems.as("a")
      .join(fitems.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("item_a"), col("b.__it").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
    val out = pairs
      .crossJoin(broadcast(nBaskets))
      .filter(col("n_pair") * minPctDen >= col("__nb") * minPctNum)
      .join(freq.select(col("__it").as("item_a"), col("__cnt").as("n_a")),
        Seq("item_a"))
      .join(freq.select(col("__it").as("item_b"), col("__cnt").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_pair"),
        round(col("n_pair").cast("double") / col("n_a").cast("double"), 7)
          .as("conf_ab"),
        round(col("n_pair").cast("double") / col("n_b").cast("double"), 7)
          .as("conf_ba"),
        round((col("n_pair").cast("double") * col("__nb").cast("double"))
            / (col("n_a").cast("double") * col("n_b").cast("double")), 7)
          .as("lift"))
    Cached(out, pinned.toSeq)
  }
}
