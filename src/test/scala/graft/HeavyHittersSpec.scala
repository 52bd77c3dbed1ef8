package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHittersAgg

/** Misra–Gries heavy hitters: exact below k distinct, and the
  * mergeable-summaries guarantee — every item with true count
  * > n/(k+1) retained, estimates in [c − n/(k+1), c] — holds under
  * adversarial input orders and partitionings.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(items: Seq[Long], k: Int,
                       parts: Int): Map[Long, Long] =
    items.toDF("i").repartition(parts)
      .agg(HeavyHittersAgg.heavyHitters(col("i"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("exact when distinct items fit in k, any partitioning") {
    val items = (1L to 20L).flatMap(i => Seq.fill(i.toInt)(i))
    for (parts <- Seq(1, 7, 32)) {
      val got = sketchOf(new scala.util.Random(5).shuffle(items),
        k = 32, parts)
      (1L to 20L).foreach(i => assert(got(i) == i, s"i=$i parts=$parts"))
    }
  }

  test("guarantee holds on skewed data across orders and partitionings") {
    // 8 hot items with 2000 hits each + 24000 singleton-tail items
    val hot = (1L to 8L).flatMap(i => Seq.fill(2000)(i))
    val tail = (1000L until 25000L).toSeq
    val all = hot ++ tail
    val n = all.length.toLong
    val k = 64
    val slack = n / (k + 1) // 620 < 2000: all hot items are true HHs
    val exact = all.groupBy(identity).map { case (i, s) => i -> s.length.toLong }
    val orders = Map(
      "sorted" -> all.sorted,
      "hot-first" -> all,
      "hot-last" -> (tail ++ hot),
      "shuffled" -> new scala.util.Random(11).shuffle(all))
    for ((name, vs) <- orders; parts <- Seq(1, 16)) {
      val got = sketchOf(vs, k, parts)
      (1L to 8L).foreach { i =>
        assert(got.contains(i), s"$name/$parts: hot item $i evicted")
        val est = got(i)
        assert(est <= exact(i) && (exact(i) - est) * (k + 1) <= n,
          s"$name/$parts: item $i est=$est exact=${exact(i)}")
      }
      // nothing ever overestimates
      got.foreach { case (i, est) =>
        assert(est <= exact(i), s"$name/$parts: $i over-counted")
      }
      assert(got.size <= k)
    }
  }

  test("all-distinct worst case never over-counts") {
    val got = sketchOf((1L to 30000L).toSeq, k = 16, parts = 8)
    got.foreach { case (i, est) => assert(est <= 1L, s"$i est=$est") }
  }

  test("grouped aggregation keeps summaries independent") {
    val rows = (1 to 10000).map(i => (i % 2, (i % (if (i % 2 == 0) 5 else 500)).toLong))
    val out = rows.toDF("g", "i").groupBy(col("g"))
      .agg(HeavyHittersAgg.heavyHitters(col("i"), 8).as("hh"))
      .select(col("g"), size(col("hh")).as("sz"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out(0) == 5)  // 5 distinct items, all retained exactly
    assert(out(1) <= 8)  // 500 distinct forced through eviction
  }
}
