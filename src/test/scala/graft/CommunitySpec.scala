package graft

import org.apache.spark.sql.functions._

import graft.ops.Community

/** Modularity algebra and the deterministic local-move sweep on
  * hand-computable graphs.
  */
class CommunitySpec extends SparkSpec {
  import spark.implicits._

  test("two disjoint triangles as own communities: Q = 1/2 exactly") {
    // the textbook value: Q = sum(e_c/m - (d_c/2m)^2) = 2*(1/2 - 1/4)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("u", "v")
    val memb = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "comm")
    val got = Community.modularityStats(e, memb)
      .select("comm", "n_nodes", "e_in", "d_sum", "q_num")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // m=6: q_num = 4*6*3 - 6^2 = 36 per community; Q = 72/(4*36) = 1/2
    assert(got.toSeq == Seq((1L, 3L, 3L, 6L, 36L), (4L, 3L, 3L, 6L, 36L)))
  }

  test("single community has Q = 0") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val memb = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("node", "comm")
    val q = Community.modularityStats(e, memb)
      .agg(sum(col("q_num"))).head().getLong(0)
    assert(q == 0L)
  }

  test("sweep from singletons: triangle nodes all move, min-id ties") {
    // m=3; every move gain*4m^2 = 4*3*1 - 2*2*2 = 4 > 0; each node's
    // two neighbor gains tie, so the move target is the smaller id
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val singl = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("node", "comm")
    val got = Community.greedyMovePass(e, singl)
      .select("node", "comm", "moved")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, true), (2L, 1L, true), (3L, 1L, true)))
  }

  test("no positive gain: a bridge node between equal masses stays") {
    // path 1-2-3 from the partition {1,2},{3}: node 2 moving to {3}
    // has gain 4m(k_ib - k_ia) - 2k(d_b - d_a + k)
    //   = 4*2*(1-1) - 2*2*(1 - 3 + 2) = 0 -> not > 0, stays
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val memb = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "comm")
    val got = Community.greedyMovePass(e, memb)
      .filter(col("node") === 2L)
      .select("comm", "moved").as[(Long, Boolean)].head()
    assert(got == ((1L, false)))
  }

  test("results are partitioning-invariant") {
    val edges = (1L to 60L).flatMap(i =>
      Seq((i, i % 20 + 100L), (i, (i * 7) % 20 + 100L)))
      .distinct.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val singl = edges.flatMap(t => Seq(t._1, t._2)).distinct
      .map(n => (n, n))
    def run(parts: Int) = Community.greedyMovePass(
        edges.toDF("u", "v").repartition(parts),
        singl.toDF("node", "comm"))
      .select("node", "comm").as[(Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("coarsen: two triangles + a bridge collapse to two self-looped " +
      "super-nodes and one weighted edge") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("u", "v")
    val memb = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "comm")
    val got = Community.coarsen(e, memb)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (4L, 4L, 3L), (1L, 4L, 1L)))
  }

  test("coarsening preserves the modularity numerator exactly " +
      "(2x-self-loop degree convention)") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("u", "v")
    val memb = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "comm")
    val qFine = Community.modularityStats(e, memb)
      .agg(sum(col("q_num"))).head().getLong(0)
    val ce = Community.coarsen(e, memb)
    val singl = Seq((1L, 1L), (4L, 4L)).toDF("node", "comm")
    val qCoarse = Community.modularityStatsW(ce, singl)
      .agg(sum(col("q_num"))).head().getLong(0)
    assert(qFine == qCoarse && qFine != 0L)
  }

  test("level-2 downOnly sweep MERGES a split clique; the plain " +
      "synchronous sweep would swap it (the pairwise pathology)") {
    // clique {4,5,6,7} mis-split into {4,5} and {6,7} by a degenerate
    // level-1 pass, plus an unrelated triangle {1,2,3}
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (6L, 7L), (4L, 6L), (4L, 7L), (5L, 6L), (5L, 7L))
      .toDF("u", "v")
    val memb1 = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 6L), (7L, 6L)).toDF("node", "comm")
    val ce = Community.coarsen(e, memb1)
    val singl = Seq((1L, 1L), (4L, 4L), (6L, 6L)).toDF("node", "comm")
    val merged = Community.greedyMovePassW(ce, singl, downOnly = true)
      .select("node", "comm").as[(Long, Long)].collect().toMap
    assert(merged == Map(1L -> 1L, 4L -> 4L, 6L -> 4L), merged.toString)
    // without downOnly: gain(4→6) = gain(6→4) = 4W·k_ab − 2k_a·k_b
    // is symmetric at singletons, so the pair label-swaps — still
    // split, forever
    val swapped = Community.greedyMovePassW(ce, singl)
      .select("node", "comm").as[(Long, Long)].collect().toMap
    assert(swapped == Map(1L -> 1L, 4L -> 6L, 6L -> 4L), swapped.toString)
    // and the merge genuinely improves modularity
    val q1 = Community.modularityStatsW(ce, singl)
      .agg(sum(col("q_num"))).head().getLong(0)
    val m2df = Seq((1L, 1L), (4L, 4L), (6L, 4L)).toDF("node", "comm")
    val q2 = Community.modularityStatsW(ce, m2df)
      .agg(sum(col("q_num"))).head().getLong(0)
    assert(q2 > q1)
  }

  test("overflow guard bounds (ADVICE r11): q_num square and gain " +
      "numerator both precede their true wrap points") {
    // in range: fine at the exact m bound with a tiny degree
    Community.guardBounds(1518500249L, 4L)
    Community.guardBounds(0L, 0L)
    // the square bound: m past floor(sqrt(2^61)) wraps d_sum^2
    val e1 = intercept[IllegalArgumentException] {
      Community.guardBounds(1518500250L, 4L)
    }
    assert(e1.getMessage.contains("(2m)^2"))
    // the gain bound: the OLD 4m*k check passed this pair, but
    // 8m*k + 2k^2 > Long.MaxValue — the silent 2x window the advice
    // named, now loud
    val m = 1500000000L
    val k = Long.MaxValue / (4L * m) // old guard: 4m*k <= Max passes
    assert(4L * m <= Long.MaxValue / k)
    val e2 = intercept[IllegalArgumentException] {
      Community.guardBounds(m, k)
    }
    assert(e2.getMessage.contains("8m*k_max"))
  }
}
