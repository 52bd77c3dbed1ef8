package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity, the deterministic synchronous local-move sweep,
  * and graph COARSENING — the full Louvain loop (Blondel et al. 2008)
  * over the co-attribute fraud-ring graph ([[Graph.coAttributeEdges]]):
  * modularity SCORES a partition (components, label-spread output, any
  * membership); the sweep is one local-move round made deterministic
  * (every node inspects its neighbor communities simultaneously, moves
  * to the largest positive modularity gain, smallest community id on
  * ties, all moves at once — no sequential visit order to diverge on,
  * so a SQL engine replays the sweep exactly); and [[coarsen]] is
  * Louvain's phase 2 — communities become super-nodes, intra-community
  * edges become SELF-LOOPS, inter-community edges aggregate into
  * weights — so the sweep can run again one level up.
  *
  * All arithmetic is INTEGER, on the WEIGHTED graph (the unweighted
  * entry points lift w = 1). With W = Σ edge weights (self-loops
  * counted once), e_c = intra-community weight (self-loops included),
  * d_c = Σ weighted degree over members (a self-loop adds 2w to its
  * node's degree — the convention that makes coarsening EXACT:
  * the coarse graph's singleton-partition modularity equals the fine
  * graph's partition modularity, numerator for numerator):
  *
  *   Q·4W²           = Σ_c (4W·e_c − d_c²)
  *   ΔQ(i: a→b)·4W²  = 4W·(k_{i,b} − k_{i,a}) − 2·k_i·(d_b − d_a + k_i)
  *
  * (k_{i,c} = edge weight from i into c, self-loops EXCLUDED — they
  * move with the node and cancel in the delta; both d's excluding i's
  * own k_i contribution cancelled into the +k_i term). Emitting the
  * 4W²-scaled numerators keeps every comparison and every output
  * exact — no float division for an oracle to round differently.
  *
  * Scale shape: degree/link frames are groupBys on node and
  * (node, comm) — shuffles on the natural keys; the 1-row W frame
  * broadcasts; coarsening is two membership joins + one grouped sum
  * (output bounded by community-pair count); nothing quadratic,
  * nothing driver-side. Overflow is guarded loudly at the true
  * bounds — (2W)² < 2⁶³ for the q_num squares and 8W·k_max + 2k_max²
  * ≤ Int64 for the gain numerator — with one cheap aggregation (the
  * a51/HITS guard pattern; see [[Community.guardBounds]]).
  *
  * Reference capability: ring detection over shared-attribute links —
  * the "which accounts move together" question behind the dashboard's
  * fraud-pattern panel (`FD/evaluation.py:154-178`), asked of the
  * graph instead of single attributes.
  */
object Community {

  private val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Unweighted edges (u < v, unique) lifted to the weighted shape. */
  private def lift(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v"), lit(1L).as("w"))

  /** (comm, n_nodes, e_in, d_sum, q_num) per community of `membership`
    * over undirected unweighted `edges` (u < v, unique),
    * q_num = 4m·e_in − d_sum². Σ q_num / 4m² is the partition's
    * modularity.
    */
  def modularityStats(edges: DataFrame, membership: DataFrame): DataFrame =
    modularityStatsW(lift(edges), membership)

  /** One synchronous greedy sweep over unweighted edges (class doc):
    * returns the new membership `(node, comm, moved)`. Nodes with no
    * positive-gain neighbor community keep their community.
    */
  def greedyMovePass(edges: DataFrame, membership: DataFrame): DataFrame =
    greedyMovePassW(lift(edges), membership)

  /** Louvain phase 2: collapse `membership`'s communities into
    * super-nodes. Input edges may carry a `w` weight column (w = 1
    * assumed otherwise) and may already contain self-loops; output is
    * the canonical weighted list `(u, v, w)` with u ≤ v, u = v the
    * self-loops (intra-community weight), total weight preserved —
    * so [[modularityStatsW]]/[[greedyMovePassW]] run one level up
    * with the SAME W and the same 4W² scale.
    */
  def coarsen(edges: DataFrame, membership: DataFrame): DataFrame = {
    val w =
      if (edges.columns.contains("w")) col("w").cast("long")
      else lit(1L)
    val memb = membership.select(col("node"), col("comm"))
    edges.select(col("u"), col("v"), w.as("w"))
      .join(memb.select(col("node").as("u"), col("comm").as("__ca")),
        Seq("u"))
      .join(memb.select(col("node").as("v"), col("comm").as("__cb")),
        Seq("v"))
      .select(least(col("__ca"), col("__cb")).as("u"),
        greatest(col("__ca"), col("__cb")).as("v"), col("w"))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
  }

  /** Weighted [[modularityStats]] over `(u, v, w)` edges, u ≤ v,
    * self-loops (u = v) allowed — the coarse-graph form. A self-loop
    * contributes w to its community's e_in and 2w to its node's
    * degree (class doc).
    */
  def modularityStatsW(wedges: DataFrame,
                       membership: DataFrame): DataFrame = {
    val e = wedges.select(col("u"), col("v"), col("w").cast("long").as("w"))
    // memb feeds three subtrees (d_sum + both ends of the intra-edge
    // join) — node-scale persist, or its upstream re-runs per consumer
    val memb = membership.select(col("node"), col("comm")).persist(disk)
    val mRow = e.agg(coalesce(sum(col("w")), lit(0L)).as("m"))
    val deg = weightedDegrees(e).persist(disk)
    guardScale(mRow, deg)
    val dSum = deg.join(memb, Seq("node"))
      .groupBy(col("comm"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("k")).as("d_sum"))
    // self-loops join u = v to the SAME membership row, so ca = cb
    // holds and their weight lands in e_in with no special case
    val eIn = e
      .join(memb.select(col("node").as("u"), col("comm").as("ca")), Seq("u"))
      .join(memb.select(col("node").as("v"), col("comm").as("cb")), Seq("v"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("comm")).agg(sum(col("w")).as("e_in"))
    dSum.join(eIn, Seq("comm"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("comm"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"),
        (lit(4L) * col("m") * coalesce(col("e_in"), lit(0L)) -
          col("d_sum") * col("d_sum")).as("q_num"))
  }

  /** Weighted [[greedyMovePass]] over `(u, v, w)` edges, u ≤ v,
    * self-loops allowed — the coarse-graph form. Self-loops shape the
    * degrees but are EXCLUDED from the neighbor-link frame: a node's
    * self-loop moves with it, so it cancels out of every gain.
    *
    * `downOnly = true` restricts moves to communities with a SMALLER
    * id — the deterministic breaker for the synchronous sweep's
    * pairwise-swap pathology: from a singleton start the gain
    * formula is SYMMETRIC across any pair (gain(a→b) = gain(b→a) =
    * 4W·k_ab − 2k_a·k_b), so two mutually-best super-nodes would
    * swap labels forever instead of merging; allowing only the
    * higher id to move turns every such swap into a true merge.
    * The level-2 sweep (g17) runs with it on.
    */
  def greedyMovePassW(wedges: DataFrame,
                      membership: DataFrame,
                      downOnly: Boolean = false): DataFrame = {
    val e = wedges.select(col("u"), col("v"), col("w").cast("long").as("w"))
    // four consumers (dSum, links, self, the final left join)
    val memb = membership.select(col("node"), col("comm")).persist(disk)
    val mRow = e.agg(coalesce(sum(col("w")), lit(0L)).as("m"))
    val nonSelf = e.filter(col("u") =!= col("v"))
    val sym = nonSelf.unionByName(nonSelf.select(col("v").as("u"),
      col("u").as("v"), col("w")))
    // deg/dSum/links are each read by TWO downstream subtrees (self +
    // gains) — persist all three or the sweep recomputes its own
    // shuffles per consumer (bench-measured 2x on g15 before the pin)
    val deg = weightedDegrees(e).persist(disk)
    guardScale(mRow, deg)
    val dSum = deg.join(memb, Seq("node"))
      .groupBy(col("comm")).agg(sum(col("k")).as("d")).persist(disk)
    // k_{i,c}: node i's edge weight into community c (self-loops out)
    val links = sym
      .join(memb.select(col("node").as("v"), col("comm").as("c")), Seq("v"))
      .groupBy(col("u").as("node"), col("c")).agg(sum(col("w")).as("kic"))
      .persist(disk)
    val self = memb.withColumnRenamed("comm", "a")
      .join(deg, Seq("node"))
      .join(dSum.select(col("comm").as("a"), col("d").as("d_a")), Seq("a"))
      .join(links.select(col("node"), col("c").as("a"),
        col("kic").as("k_ia")), Seq("node", "a"), "left")
      .select(col("node"), col("a"), col("k"), col("d_a"),
        coalesce(col("k_ia"), lit(0L)).as("k_ia"))
    val gains = self
      .join(links.select(col("node"), col("c").as("b"),
        col("kic").as("k_ib")), Seq("node"))
      .filter(col("b") =!= col("a"))
      .join(dSum.select(col("comm").as("b"), col("d").as("d_b")), Seq("b"))
      .crossJoin(broadcast(mRow))
      .withColumn("gain",
        lit(4L) * col("m") * (col("k_ib") - col("k_ia")) -
          lit(2L) * col("k") * (col("d_b") - col("d_a") + col("k")))
      .filter(col("gain") > 0L)
      .filter(if (downOnly) col("b") < col("a") else lit(true))
    // deterministic argmax: max gain, then smallest target community
    val best = gains.groupBy(col("node"), col("a"))
      .agg(max(struct(col("gain"), (-col("b")).as("nb"))).as("best"))
      .select(col("node"), col("a"), (-col("best.nb")).as("b"))
    memb.join(best.select(col("node"), col("b")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("b"), col("comm")).as("comm"),
        col("b").isNotNull.as("moved"))
  }

  case class LouvainResult(membership: DataFrame, trace: DataFrame)

  /** FULL Louvain to convergence (r12 verdict mandate #4): the
    * [[greedyMovePassW]] → [[coarsen]] pair iterated until a level's
    * sweep makes ZERO moves or `maxLevels` is reached — level 1 on
    * the fine graph, every deeper level on the coarse graph with
    * `downOnly` (the synchronous-swap breaker; g17's stance). The new
    * surface over g17 is the TERMINATION RULE and the membership
    * COMPOSITION across levels, both chosen to be replayable by a
    * static SQL unroll: a converged level is a fixed point (zero
    * moves ⇒ singleton membership ⇒ coarsen is the identity ⇒ every
    * deeper sweep also moves nothing), so the early stop below and an
    * oracle that computes all `maxLevels` levels unconditionally
    * produce IDENTICAL outputs — the stopped levels just repeat.
    *
    * Returns `membership` — one row per FINE node with its community
    * at every level (`node`, `c1`, …, `c<maxLevels>`; post-
    * convergence columns repeat the converged label) — and `trace` —
    * one row per EXECUTED level (`level`, `n_comms`, `moves`,
    * `q_total` at the 4m² scale; level 0 is the singleton baseline,
    * level k > 1 executed iff level k−1 moved; coarsening exactness
    * makes each coarse q_total THE fine-partition modularity).
    *
    * Scale shape: every per-level frame is node/community-bounded and
    * eagerly cut ([[graft.ops.Layout.materializeBounded]] — the g17
    * lesson: persist-only boundaries re-expanded the level-1 subtree
    * ~50× into the analyzer); per-level cost SHRINKS with the
    * community count because every level-k shuffle runs on the
    * level-(k−1) coarse graph. The driver holds only the per-level
    * scalar counts (moves, q) — membership stays distributed.
    */
  def louvain(edges: DataFrame, maxLevels: Int = 3): LouvainResult = {
    require(maxLevels >= 1 && maxLevels <= 8,
      s"maxLevels in [1, 8], got $maxLevels")
    val cut = (df: DataFrame) =>
      graft.ops.Layout.materializeBounded(df, maxRows = 10000000L)
    val e0 = lift(edges)
    val nodes0 = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node"))).distinct()
    var fine = cut(nodes0.withColumn("c0", col("node")))
    // singleton baseline in ONE pass: e_in = 0 everywhere (no fine
    // self-loops), so q0 = -SUM(k^2) directly from degrees instead of
    // the stats op's three joins over the full edge list
    val q0 = -weightedDegrees(e0)
      .agg(coalesce(sum(col("k") * col("k")), lit(0L))).head().getLong(0)
    val trace = Vector.newBuilder[(Long, Long, Long, Long)]
    trace += ((0L, fine.count(), 0L, q0))
    // the FINE edge list is never cut/collected (the caller persists
    // it); only coarse graphs, community-pair-bounded, go through the
    // cut below
    var wedges = e0
    var level = 1
    var converged = false
    while (level <= maxLevels && !converged) {
      val cnodes = wedges.select(col("u").as("node"))
        .unionByName(wedges.select(col("v").as("node"))).distinct()
      val memb = cut(greedyMovePassW(wedges,
        cnodes.withColumn("comm", col("node")),
        downOnly = level >= 2))
      // memb is a driver-local relation after the cut, so this
      // combined moves/n_comms aggregation is one trivial action
      val mc = memb.agg(
        sum(when(col("moved"), 1L).otherwise(0L)).as("__mv"),
        count_distinct(col("comm")).as("__nc")).head()
      val (moves, nComms) = (mc.getLong(0), mc.getLong(1))
      val mb = memb.select(col("node"), col("comm"))
      val qk = modularityStatsW(wedges, mb)
        .agg(coalesce(sum(col("q_num")), lit(0L))).head().getLong(0)
      trace += ((level.toLong, nComms, moves, qk))
      fine = cut(fine.join(
        mb.select(col("node").as("__prev"), col("comm").as(s"c$level")),
        fine(s"c${level - 1}") === col("__prev")).drop("__prev"))
      if (moves == 0L) converged = true
      else wedges = cut(coarsen(wedges, mb))
      level += 1
    }
    // post-convergence levels repeat the converged label (object doc)
    var k = level
    while (k <= maxLevels) {
      fine = fine.withColumn(s"c$k", col(s"c${k - 1}"))
      k += 1
    }
    val spark = edges.sparkSession
    import spark.implicits._
    LouvainResult(
      fine.drop("c0"),
      trace.result().toDF("level", "n_comms", "moves", "q_total"))
  }

  /** Weighted degree per node: Σ incident non-self weight + 2 × own
    * self-loop weight (class doc — the convention that preserves
    * modularity under coarsening).
    */
  private def weightedDegrees(e: DataFrame): DataFrame = {
    val nonSelf = e.filter(col("u") =!= col("v"))
    nonSelf.select(col("u").as("node"), col("w"))
      .unionByName(nonSelf.select(col("v").as("node"), col("w")))
      .unionByName(e.filter(col("u") === col("v"))
        .select(col("u").as("node"), (col("w") * 2L).as("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("k"))
  }

  /** Loud integer-overflow guard (the ADVICE r10 pattern): one tiny
    * aggregation feeds [[guardBounds]], failing identically on both
    * engines' behalf rather than wrapping.
    */
  private def guardScale(mRow: DataFrame, deg: DataFrame): Unit = {
    val m = mRow.head().getLong(0)
    val kMax = deg.agg(max(col("k"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    guardBounds(m, kMax)
  }

  /** The pure bound check (ADVICE r11: the guard must precede EVERY
    * overflow, at its true bound). Two numerators to protect:
    *
    *   - q_num = 4m·e_in − d_sum²: e_in ≤ m and d_sum ≤ 2m, so both
    *     terms fit Int64 iff (2m)² < 2⁶³ ⇔ m ≤ 1518500249
    *     (the old m < 2³¹ under-guarded by ~√2: m ∈ [1.52e9, 2.15e9)
    *     wrapped d_sum² silently);
    *   - gain = 4m·(k_ib − k_ia) − 2k·(d_b − d_a + k): with
    *     k_i{a,b} ∈ [0, k] and |d_b − d_a| ≤ 2m, the first term is
    *     ≤ 4m·k and the second ≤ 2k·(2m + k), so |gain| ≤
    *     8m·k + 2k² — checked in BigInt so the guard arithmetic
    *     itself cannot wrap (the old 4m·k_max check admitted gains
    *     at 2× the guarded bound).
    *
    * On a weighted graph m is the total WEIGHT and k the weighted
    * degree — the same derivation verbatim. Package-private:
    * CommunitySpec exercises the bounds directly — constructing 1.5e9
    * edges to trip them through the frame API is not a test.
    */
  private[graft] def guardBounds(m: Long, kMax: Long): Unit = {
    require(m <= 1518500249L,
      s"modularity numerators need (2m)^2 < 2^63: m=$m too large")
    require(kMax <= 0L ||
      BigInt(8) * m * kMax + BigInt(2) * kMax * kMax <= Long.MaxValue,
      s"gain numerator 8m*k_max + 2k_max^2 overflows Int64: " +
        s"m=$m, k_max=$kMax — coarsen or split the graph")
  }
}
