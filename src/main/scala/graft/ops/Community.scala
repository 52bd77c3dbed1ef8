package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity and one synchronous greedy refinement sweep —
  * the community-quality layer over the co-attribute fraud-ring graph
  * ([[Graph.coAttributeEdges]]): modularity SCORES a partition
  * (components, label-spread output, any membership), and the sweep
  * is one Louvain-style local-move round (Blondel et al. 2008) made
  * deterministic: every node inspects its neighbor communities
  * simultaneously, moves to the one with the largest positive
  * modularity gain (smallest community id on ties), and all moves
  * apply at once — no sequential visit order to diverge on, so a SQL
  * engine replays the sweep exactly.
  *
  * All arithmetic is INTEGER. With m = |E|, e_c = intra-community
  * edges, d_c = Σ degree over members:
  *
  *   Q·4m²           = Σ_c (4m·e_c − d_c²)
  *   ΔQ(i: a→b)·4m²  = 4m·(k_{i,b} − k_{i,a}) − 2·k_i·(d_b − d_a + k_i)
  *
  * (k_{i,c} = edges from i into c, both d's EXCLUDING i's own k_i
  * contribution cancelled into the +k_i term). Emitting the 4m²-scaled
  * numerators keeps every comparison and every output exact — no
  * float division for an oracle to round differently.
  *
  * Scale shape: degree/link frames are groupBys on node and
  * (node, comm) — shuffles on the natural keys; the 1-row m frame
  * broadcasts; nothing quadratic, nothing driver-side. Overflow is
  * guarded loudly at the true bounds — (2m)² < 2⁶³ for the q_num
  * squares and 8m·k_max + 2k_max² ≤ Int64 for the gain numerator —
  * with one cheap aggregation (the a51/HITS guard pattern; see
  * [[Community.guardBounds]]).
  *
  * Reference capability: ring detection over shared-attribute links —
  * the "which accounts move together" question behind the dashboard's
  * fraud-pattern panel (`FD/evaluation.py:154-178`), asked of the
  * graph instead of single attributes.
  */
object Community {

  /** (comm, n_nodes, e_in, d_sum, q_num) per community of `membership`
    * over undirected `edges` (u < v, unique), q_num = 4m·e_in − d_sum².
    * Σ q_num / 4m² is the partition's modularity.
    */
  def modularityStats(edges: DataFrame, membership: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    // memb feeds three subtrees (d_sum + both ends of the intra-edge
    // join) — node-scale persist, or its upstream re-runs per consumer
    val memb = membership.select(col("node"), col("comm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mRow = e.agg(count(lit(1)).as("m"))
    val sym = Graph.symmetrize(e)
    // deg feeds the guard AND the stats — persist (the guard's max
    // aggregation doubles as the eager materialization)
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    guardScale(mRow, deg)
    val dSum = deg.join(memb, Seq("node"))
      .groupBy(col("comm"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("k")).as("d_sum"))
    val eIn = e
      .join(memb.select(col("node").as("u"), col("comm").as("ca")), Seq("u"))
      .join(memb.select(col("node").as("v"), col("comm").as("cb")), Seq("v"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("comm")).agg(count(lit(1)).as("e_in"))
    dSum.join(eIn, Seq("comm"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("comm"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"),
        (lit(4L) * col("m") * coalesce(col("e_in"), lit(0L)) -
          col("d_sum") * col("d_sum")).as("q_num"))
  }

  /** One synchronous greedy sweep (see class doc): returns the new
    * membership `(node, comm, moved)`. Nodes with no positive-gain
    * neighbor community keep their community.
    */
  def greedyMovePass(edges: DataFrame, membership: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    // four consumers (dSum, links, self, the final left join)
    val memb = membership.select(col("node"), col("comm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mRow = e.agg(count(lit(1)).as("m"))
    val sym = Graph.symmetrize(e)
    // deg/dSum/links are each read by TWO downstream subtrees (self +
    // gains) — persist all three or the sweep recomputes its own
    // shuffles per consumer (bench-measured 2x on g15 before the pin)
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("k"))
      .persist(disk)
    guardScale(mRow, deg)
    val dSum = deg.join(memb, Seq("node"))
      .groupBy(col("comm")).agg(sum(col("k")).as("d")).persist(disk)
    // k_{i,c}: node i's edge count into community c
    val links = sym
      .join(memb.select(col("node").as("v"), col("comm").as("c")), Seq("v"))
      .groupBy(col("u").as("node"), col("c")).agg(count(lit(1)).as("kic"))
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
    // deterministic argmax: max gain, then smallest target community
    val best = gains.groupBy(col("node"), col("a"))
      .agg(max(struct(col("gain"), (-col("b")).as("nb"))).as("best"))
      .select(col("node"), col("a"), (-col("best.nb")).as("b"))
    memb.join(best.select(col("node"), col("b")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("b"), col("comm")).as("comm"),
        col("b").isNotNull.as("moved"))
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
    * Package-private: CommunitySpec exercises the bounds directly —
    * constructing 1.5e9 edges to trip them through the frame API is
    * not a test.
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
