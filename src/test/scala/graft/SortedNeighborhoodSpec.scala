package graft

import org.apache.spark.sql.functions._

import graft.ops.SortedNeighborhood

/** Sorted-neighborhood blocking: positions replay a plain global sort,
  * candidate pairs are exactly the < w-apart pairs, the reversed-key
  * second pass catches leading-char edits the forward pass misses,
  * and results are partitioning-invariant.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (0L, "alpha one"), (1L, "lpha one"), // leading-char deletion pair
    (2L, "beta two"), (3L, "beta twa"), // tail edit pair
    (4L, "gamma three"), (5L, "zeta nine"),
    (6L, "omega five"), (7L, "omega fivz"))

  test("positions equal the naive global-rank spelling") {
    for (parts <- Seq(1, 4)) {
      val df = rows.toDF("id", "name").repartition(parts)
      val got = SortedNeighborhood
        .positions(df, col("name"), "id", w = 3)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      // naive: sort by (5-char/7-bit packed prefix, id)
      val want = rows.map { case (id, name) =>
        val p = name.padTo(5, ' ').take(5)
        val num = p.foldLeft(0L)((acc, c) => acc * 128 + (c.toInt % 128))
        (num * (1L << 21) + id, id)
      }.sortBy(_._1).zipWithIndex
        .map { case ((_, id), i) => id -> (i + 1L) }.toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("candidates are exactly the pairs under w positions apart") {
    val df = rows.toDF("id", "name")
    val got = SortedNeighborhood
      .candidates(df, col("name"), "id", w = 3)
      .select("id_a", "id_b", "gap").as[(Long, Long, Long)]
      .collect().toSet
    val pos = SortedNeighborhood.positions(df, col("name"), "id", w = 3)
      .select("id", "pos").as[(Long, Long)].collect()
    val want = (for {
      (ia, pa) <- pos; (ib, pb) <- pos
      if pb > pa && pb - pa < 3
    } yield (ia, ib, pb - pa)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("multi-pass: reversed key finds the leading-char pair") {
    val df = rows.toDF("id", "name")
    val mp = SortedNeighborhood.multiPass(df, "id",
        Seq("fwd" -> col("name"), "rev" -> reverse(col("name"))), w = 3)
      .select("id_a", "id_b", "found_fwd", "found_rev")
      .as[(Long, Long, Boolean, Boolean)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // (0, 1): "alpha one" vs "lpha one" — far apart forward (a* vs l*),
    // adjacent reversed (both end "...one")
    assert(mp.contains((0L, 1L)), s"rev pass must surface (0,1): $mp")
    assert(mp((0L, 1L))._2, "found by the reversed pass")
    // (6, 7): shared 5-char forward prefix "omega"
    assert(mp.contains((6L, 7L)) && mp((6L, 7L))._1)
  }

  test("id out of packed range fails loudly") {
    val bad = Seq((1L << 21, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      SortedNeighborhood.positions(bad, col("name"), "id", w = 2).count()
    }
  }

  test("duplicate ids fail loudly (ADVICE r11: tied packed keys would " +
      "rank arbitrarily)") {
    val bad = Seq((5L, "aaa"), (5L, "bbb"), (6L, "ccc"))
      .toDF("id", "name")
    val ex = intercept[IllegalArgumentException] {
      SortedNeighborhood.positions(bad, col("name"), "id", w = 2).count()
    }
    assert(ex.getMessage.contains("unique"))
  }
}
