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

  /** The full Louvain loop in plain Scala maps — the spec-side
    * reference [[graft.ops.Community.louvain]] must match move for
    * move: same synchronous sweep (max gain, smallest target id on
    * ties, downOnly at level >= 2), same coarsen, same termination.
    */
  private def louvainReplay(edges0: Seq[(Long, Long)], maxLevels: Int)
      : (Map[Long, Vector[Long]], Vector[(Long, Long, Long, Long)]) = {
    var wedges: Map[(Long, Long), Long] =
      edges0.map { case (u, v) => (math.min(u, v), math.max(u, v)) }
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    def stats(we: Map[(Long, Long), Long], mb: Map[Long, Long]) = {
      val m = we.values.sum
      val deg = collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      we.foreach { case ((u, v), w) =>
        if (u == v) deg(u) += 2L * w
        else { deg(u) += w; deg(v) += w }
      }
      val dSum = deg.groupBy { case (n, _) => mb(n) }
        .map { case (c, g) => c -> g.values.sum }
      val eIn = we.toSeq.filter { case ((u, v), _) => mb(u) == mb(v) }
        .groupBy { case ((u, _), _) => mb(u) }
        .map { case (c, g) => c -> g.map(_._2).sum }
        .withDefaultValue(0L)
      val q = dSum.map { case (c, d) => 4L * m * eIn(c) - d * d }.sum
      (m, deg.toMap.withDefaultValue(0L), dSum.withDefaultValue(0L), q)
    }
    def sweep(we: Map[(Long, Long), Long],
              downOnly: Boolean): Map[Long, Long] = {
      val nodes = we.keySet.flatMap(p => Seq(p._1, p._2))
      val mb = nodes.map(n => n -> n).toMap
      val (m, deg, dSum, _) = stats(we, mb)
      val links = collection.mutable.Map.empty[(Long, Long), Long]
        .withDefaultValue(0L)
      we.foreach { case ((u, v), w) =>
        if (u != v) {
          links((u, mb(v))) += w
          links((v, mb(u))) += w
        }
      }
      nodes.map { i =>
        val a = mb(i)
        val kIa = links((i, a))
        // toSeq first: collect on a Map would DEDUPE the (gain, b)
        // pairs by gain, silently dropping tied candidates
        val cands = links.toSeq.collect {
          case ((n, b), kIb) if n == i && b != a &&
              (!downOnly || b < a) =>
            (4L * m * (kIb - kIa) -
              2L * deg(i) * (dSum(b) - dSum(a) + deg(i)), b)
        }.filter(_._1 > 0L)
        if (cands.isEmpty) i -> a
        else {
          val best = cands.maxBy { case (g, b) => (g, -b) }
          i -> best._2
        }
      }.toMap
    }
    val nodes0 = wedges.keySet.flatMap(p => Seq(p._1, p._2)).toVector.sorted
    var fine: Map[Long, Vector[Long]] = nodes0.map(n => n -> Vector(n)).toMap
    val q0 = stats(wedges, nodes0.map(n => n -> n).toMap)._4
    val trace = Vector.newBuilder[(Long, Long, Long, Long)]
    trace += ((0L, nodes0.size.toLong, 0L, q0))
    var level = 1
    var converged = false
    while (level <= maxLevels && !converged) {
      val mb = sweep(wedges, downOnly = level >= 2)
      val moves = mb.count { case (n, c) => n != c }.toLong
      val qk = stats(wedges, mb)._4
      trace += ((level.toLong, mb.values.toSet.size.toLong, moves, qk))
      fine = fine.map { case (n, cs) => n -> (cs :+ mb(cs.last)) }
      if (moves == 0L) converged = true
      else wedges = wedges.toSeq.map { case ((u, v), w) =>
        ((math.min(mb(u), mb(v)), math.max(mb(u), mb(v))), w)
      }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      level += 1
    }
    val filled = fine.map { case (n, cs) =>
      n -> (cs ++ Vector.fill(maxLevels + 1 - cs.size)(cs.last)).tail
    }
    (filled, trace.result())
  }

  test("full Louvain (r12 mandate #4): a two-tier clique hierarchy " +
      "needs TWO coarsen rounds; the op matches the plain-Scala " +
      "replay level for level") {
    // four K4 cliques 0-3, 10-13, 20-23, 30-33; clique pairs bridged
    // by two edges (0-10, 1-11 / 20-30, 21-31), the pair super-
    // clusters by one (13-23) — level 1 collapses cliques, level 2
    // merges bridged pairs, a genuinely hierarchical instance
    def k4(base: Long) = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i, base + j)
    val edges = (k4(0) ++ k4(10) ++ k4(20) ++ k4(30) ++
      Seq((0L, 10L), (1L, 11L), (20L, 30L), (21L, 31L), (13L, 23L)))
      .map { case (u, v) => (u.toLong, v.toLong) }
    val (refMemb, refTrace) = louvainReplay(edges, maxLevels = 3)
    // the fixture is only valid if depth 3 genuinely executes
    assert(refTrace.exists(t => t._1 == 2L && t._3 > 0L),
      s"fixture converged before level 2: $refTrace")
    assert(refTrace.exists(_._1 == 3L), s"level 3 never ran: $refTrace")
    val res = graft.ops.Community.louvain(
      edges.toDF("u", "v"), maxLevels = 3)
    val gotTrace = res.trace
      .select($"level", $"n_comms", $"moves", $"q_total")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toVector
    assert(gotTrace == refTrace, s"got $gotTrace\nref $refTrace")
    val gotMemb = res.membership.select($"node", $"c1", $"c2", $"c3")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Vector(r._2, r._3, r._4)).toMap
    assert(gotMemb == refMemb,
      s"membership diverged: ${gotMemb.toSeq.sortBy(_._1)}")
    // and the final partition is the four cliques' two super-clusters
    // or coarser — every clique must be intact inside one community
    val byClique = gotMemb.groupBy { case (n, _) => n / 10L }
      .map { case (c, g) => c -> g.values.map(_.last).toSet.size }
    assert(byClique.values.forall(_ == 1), byClique.toString)
  }

  test("full Louvain: early stop is a fixed point — a clique " +
      "converging at level 3 repeats its label through c4, and no " +
      "level-4 trace row is emitted") {
    // K4 alone: level 1 swaps (0<->1 pathology), level 2 downOnly
    // merges to one community with one move, level 3 moves nothing ->
    // converged; level 4 must not execute and c4 must repeat c3
    val edges = (for { i <- 0 until 4; j <- i + 1 until 4 }
      yield (i.toLong, j.toLong))
    val (refMemb, refTrace) = louvainReplay(edges, maxLevels = 4)
    assert(refTrace.size == 4 && refTrace.last._1 == 3L &&
      refTrace.last._3 == 0L, refTrace.toString)
    val res = graft.ops.Community.louvain(
      edges.toDF("u", "v"), maxLevels = 4)
    val gotTrace = res.trace
      .select($"level", $"n_comms", $"moves", $"q_total")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toVector
    assert(gotTrace == refTrace, s"got $gotTrace\nref $refTrace")
    val gotMemb = res.membership
      .select($"node", $"c1", $"c2", $"c3", $"c4")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Vector(r._2, r._3, r._4, r._5)).toMap
    assert(gotMemb == refMemb, gotMemb.toString)
    gotMemb.values.foreach(cs => assert(cs(3) == cs(2),
      s"post-convergence label must repeat: $cs"))
    // and every node landed in the single merged community
    assert(gotMemb.values.map(_.last).toSet.size == 1)
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

  test("singleton fast path == general sweep: unweighted, weighted " +
      "self-loops, downOnly both ways") {
    // two triangles + bridge (ties, bridges), then its coarse graph
    // (self-loops + weights) — the two shapes every caller runs
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("u", "v")
    val singl = (1L to 6L).map(n => (n, n)).toDF("node", "comm")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("node", "comm", "moved")
        .as[(Long, Long, Boolean)].collect().toSet
    assert(norm(Community.greedyMoveFromSingletons(e)) ==
      norm(Community.greedyMovePass(e, singl)))
    val memb = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "comm")
    val ce = Community.coarsen(e, memb)
    val csingl = Seq((1L, 1L), (4L, 4L)).toDF("node", "comm")
    for (down <- Seq(false, true))
      assert(norm(Community.greedyMoveFromSingletonsW(ce, downOnly = down))
        == norm(Community.greedyMovePassW(ce, csingl, downOnly = down)),
        s"downOnly=$down")
  }

  test("singletonQNum prices a partition through its coarse graph " +
      "(== modularityStats total) and matches its no-self-loop arm") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("u", "v")
    val memb = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "comm")
    val qFine = Community.modularityStats(e, memb)
      .agg(sum(col("q_num"))).head().getLong(0)
    assert(Community.singletonQNum(Community.coarsen(e, memb)) == qFine)
    val w1 = e.withColumn("w", lit(1L))
    assert(Community.singletonQNum(w1, noSelfLoops = true) ==
      Community.singletonQNum(w1))
  }

  test("Local driver algebra == the frame ops on a weighted " +
      "self-looped coarse graph (sweep/coarsen/qNum/stats)") {
    import graft.ops.Community.Local
    // a coarse-shaped graph: self-loops, weights, a tie candidate
    val tuples = Seq((1L, 1L, 3L), (1L, 4L, 2L), (4L, 4L, 1L),
      (4L, 7L, 2L), (1L, 7L, 2L), (7L, 9L, 1L), (9L, 9L, 2L))
    val ce = tuples.toDF("u", "v", "w")
    val es = tuples.toArray
    val singl = Seq(1L, 4L, 7L, 9L).map(n => (n, n)).toDF("node", "comm")
    for (down <- Seq(false, true)) {
      val frame = Community.greedyMoveFromSingletonsW(ce, downOnly = down)
        .select("node", "comm", "moved")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(Local.sweep(es, downOnly = down).toSeq == frame,
        s"downOnly=$down")
    }
    val memb = Map(1L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L)
    val membDf = memb.toSeq.toDF("node", "comm")
    val frameCoarse = Community.coarsen(ce, membDf)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(Local.coarsen(es, memb).toSeq == frameCoarse)
    assert(Local.qNum(es) == Community.singletonQNum(ce))
    val frameStats = Community.modularityStatsW(ce, membDf)
      .select("comm", "n_nodes", "e_in", "d_sum", "q_num")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(Local.stats(es, memb).toSeq == frameStats)
  }
}
