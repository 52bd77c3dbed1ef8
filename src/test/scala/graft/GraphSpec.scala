package graft

import org.apache.spark.sql.functions._
import graft.ops.{Checkpoints, Graph}

/** Hand-computed gates for the fraud-ring graph toolkit, plus the
  * reliable-checkpoint path for iterative ops.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDF(pairs: (Long, Long)*) =
    pairs.toDF("u", "v")

  test("coAttributeEdges: qualification threshold and pair counts") {
    // users 1,2,3 each carry attr "a" 3 times (qualified); user 4 only
    // once (filtered); users 1,2 also share attr "b" 3 times each
    val rows =
      (for (u <- 1L to 3L; _ <- 1 to 3) yield (u, "a")) ++
      (for (u <- 1L to 2L; _ <- 1 to 3) yield (u, "b")) ++
      Seq((4L, "a"))
    val df = rows.toDF("user", "attr")
    val got = Graph.coAttributeEdges(df, "user", "attr", minEvents = 3)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) share a AND b; (1,3) and (2,3) share only a
    assert(got === Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("coAttributeEdges: super-node attribute dropped by maxAttrUsers") {
    val rows =
      (for (u <- 1L to 10L; _ <- 1 to 3) yield (u, "hot")) ++
      (for (u <- 1L to 2L; _ <- 1 to 3) yield (u, "cold"))
    val df = rows.toDF("user", "attr")
    val got = Graph.coAttributeEdges(df, "user", "attr",
        minEvents = 3, maxAttrUsers = 5)
      .as[(Long, Long, Long)].collect().toSet
    // "hot" links 10 users > cap 5 → dropped; only "cold" survives
    assert(got === Set((1L, 2L, 1L)))
  }

  test("pageRank: integer fixed-point matches the hand-run on a path") {
    // path 1–2–3, deg = (1, 2, 1); 3 iterations at scale 10^6, d=85%:
    //   it1: (575000, 1850000, 575000)
    //   it2: (936250, 1127500, 936250)
    //   it3: (629187, 1741625, 629187)   [floor divisions throughout]
    val ranks = Graph.pageRank(edgesDF((1L, 2L), (2L, 3L)), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks === Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L))
  }

  test("personalizedPageRank: seed-conditional restart, hand-run on a path") {
    // path 1–2–3, seed {1}; r0 = (10^6, 0, 0):
    //   it1: 1 → 150000, 2 → 850000 (85% of seed's full push), 3 → 0
    //   it2: contribs (150000, 425000, 0):
    //        1 → 150000 + 85·425000//100 = 511250
    //        2 → 85·150000//100 = 127500, 3 → 361250
    val seeds = Seq(1L, 99L).toDF("node") // 99 has no edges — ignored
    val ranks = Graph.personalizedPageRank(
      edgesDF((1L, 2L), (2L, 3L)), seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(ranks === Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L))
  }

  test("personalizedPageRank: no seeds → all ranks exactly 0") {
    // mass only enters through the restart term: with an empty seed
    // set every node must sit at literal 0, not a smoothing floor
    val none = Seq.empty[Long].toDF("node")
    val ranks = Graph.personalizedPageRank(
      edgesDF((1L, 2L), (2L, 3L)), none, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("linkPrediction: wedge pairs, adjacency excluded, hand jaccard") {
    // K3 {1,2,3} + pendant 3–4: non-adjacent distance-2 pairs are
    // (1,4) and (2,4), each with cn=1 via node 3; deg(1)=2, deg(4)=1
    // → jaccard = 1/(2+1−1) = 0.5. Adjacent pairs never appear.
    val k3p = edgesDF((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val got = Graph.linkPrediction(k3p, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set((1L, 4L), (2L, 4L)))
    assert(got((1L, 4L)) == ((1L, 0.5)) && got((2L, 4L)) == ((1L, 0.5)))
    // a complete graph has no distance-2 non-edges: empty prediction
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    assert(Graph.linkPrediction(edgesDF(k4: _*), 10).count() == 0)
    // middle-degree cap: a star hub (deg 3 > cap 2) stops carrying
    // wedges, so the leaf pairs vanish; Jaccard keeps TRUE degrees
    // when the middle survives the cap
    val star = edgesDF((9L, 1L), (9L, 2L), (9L, 3L))
    assert(Graph.linkPrediction(star, 10).count() == 3)
    assert(Graph.linkPrediction(star, 10, maxMiddleDegree = 2)
      .count() == 0)
  }

  test("triangleCounts: 4-clique plus pendant edge") {
    // K4 on {1,2,3,4}: 4 triangles, each node in exactly 3;
    // pendant 5 (edge 4–5) is in none and absent from the output
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val got = Graph.triangleCounts(edgesDF(k4 :+ ((4L, 5L)): _*))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("khopReach: bounded BFS with an isolated seed") {
    val seeds = Seq(1L, 9L).toDF("node")
    val got = Graph.khopReach(
        edgesDF((1L, 2L), (2L, 3L), (3L, 4L)), seeds, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    // 9 is isolated (hops 0); 4 is 3 hops out — beyond the bound
    assert(got === Map(1L -> 0, 9L -> 0, 2L -> 1, 3L -> 2))
  }

  test("reliable checkpoint dir: iterative ops agree with the local path") {
    val dir = "/tmp/graft-ckpt-spec"
    // a stale dir from a previous run would satisfy the "wrote files"
    // assertion even if THIS run wrote nothing — start (and end) clean
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    rmTree(new java.io.File(dir))
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val local = graft.ops.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = graft.ops.Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toSet
      assert(reliable === local)
      assert(reliable === Set((1L, 1L), (2L, 1L), (3L, 1L),
        (10L, 10L), (11L, 10L)))
      // the reliable path actually wrote checkpoint files
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, s"no checkpoint files under $dir")
      val khop = Graph.khopReach(edgesDF((1L, 2L)), Seq(1L).toDF("node"), 1)
        .as[(Long, Int)].collect().toMap
      assert(khop === Map(1L -> 0, 2L -> 1))
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
      rmTree(new java.io.File(dir))
    }
  }

  test("assortativity: star = -1, regular graph = null") {
    // K1,3 star: hub degree 3 links only degree-1 leaves → perfectly
    // disassortative
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val r = Graph.assortativity(star).first()
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == -1.0, r.toString)
    // 4-cycle: every degree is 2 → zero variance → null
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val r2 = Graph.assortativity(ring).first()
    assert(r2.getLong(0) == 8L && r2.isNullAt(1), r2.toString)
  }

  test("assortativity matches a hand-computed mixed graph") {
    // path 1-2-3 plus pendant 3-4: degrees 1,2,2,1
    // directed endpoint pairs: (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
    // → x=[1,2,2,2,2,1], y=[2,1,2,2,1,2]: mx=my=5/3,
    // vx=vy=2/9, cxy=(16/6)-(25/9)=-1/9 → r=-0.5
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = Graph.assortativity(g).first()
    assert(math.abs(r.getDouble(1) + 0.5) < 1e-9, r.toString)
  }

  test("kCore: peel cascade exposes layers until the 2-core triangle") {
    // triangle 1-2-3 with a tail 3-4-5: peel 5 (deg 1), then 4
    val e = edgesDF((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val after1 = Graph.kCore(e, k = 2, iters = 1)
      .as[(Long, Long)].collect().toMap
    // one peel: 5 gone; 4 still holds its (now dangling) edge to 3
    assert(after1 === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    val after2 = Graph.kCore(e, k = 2, iters = 2)
      .as[(Long, Long)].collect().toSet
    assert(after2 === Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: k above the densest core empties the graph") {
    val e = edgesDF((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(Graph.kCore(e, k = 3, iters = 2).count() === 0L)
  }

  test("labelSpread: hand-traced two-class diffusion on a path") {
    // path 1-2-3, seed 1 -> class 0, seed 3 -> class 1 (class 2 unused)
    // iter1: node2 gets 850000 of each; iter2: node1 m0=511250
    // m1=361250 (label 0), node2 127500/127500 (tie -> 0), node3
    // mirror (label 1)
    val e = edgesDF((1L, 2L), (2L, 3L))
    val seeds = Seq((1L, 0), (3L, 1)).toDF("node", "cls")
    val got = Graph.labelSpread(e, seeds, numClasses = 3, iters = 2)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(r.fieldIndex("label"))))
    assert(got.toSeq === Seq(
      (1L, 511250L, 361250L, 0),
      (2L, 127500L, 127500L, 0),
      (3L, 361250L, 511250L, 1)))
  }

  test("labelSpread: unreached nodes stay unlabeled (null)") {
    // two components; seeds only in the first
    val e = edgesDF((1L, 2L), (3L, 4L))
    val seeds = Seq((1L, 0)).toDF("node", "cls")
    val rows = Graph.labelSpread(e, seeds, numClasses = 2, iters = 2)
      .orderBy("node").collect()
    assert(!rows(0).isNullAt(rows(0).fieldIndex("label")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("label")))
    assert(rows(3).isNullAt(rows(3).fieldIndex("label")))
  }

  test("connectedComponents: pointer jumping labels a chain in " +
       "log rounds") {
    // path 1-2-...-8 (diameter 7) plus disjoint pair 20-21: plain
    // propagation needs 7 rounds; propagate+jump converges in 3
    val chain = (1L to 7L).map(i => (i, i + 1)) :+ (20L, 21L)
    val got = Graph.connectedComponents(edgesDF(chain: _*), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val want = (1L to 8L).map(_ -> 1L).toMap ++
      Map(20L -> 20L, 21L -> 20L)
    assert(got === want)
    // 1 round reaches distance 2 (one propagate + one jump), not 7:
    // prop gives node 8 label 7, the jump replaces it by 7's
    // propagated label 6
    val partial = Graph.connectedComponents(edgesDF(chain: _*), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(partial(8L) === 6L)
  }

  test("shortestPaths: Bellman-Ford relaxes through the cheap detour") {
    // 1->3 direct costs 10; 1->2->3 costs 2+2=4; seed {1}
    val e = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 10L))
      .toDF("u", "v", "w")
    val seeds = Seq(1L).toDF("node")
    val r2 = Graph.shortestPaths(e, seeds, col("w"), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 0L, 2L -> 2L, 3L -> 4L))
    // one round only: the direct edge wins (detour needs 2 relaxations)
    val r1 = Graph.shortestPaths(e, seeds, col("w"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
  }

  test("shortestPaths: unreached component absent, isolated seed ignored") {
    val e = Seq((1L, 2L, 5L), (3L, 4L, 5L)).toDF("u", "v", "w")
    val seeds = Seq(1L, 99L).toDF("node") // 99 carries no edges
    val got = Graph.shortestPaths(e, seeds, col("w"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 5L))
  }

  test("hits: the shared attribute is the top authority, the spanning " +
    "user the top hub, max-rescale pins both maxima at scale") {
    // attr 10 holds users 1,2,3; attr 20 only user 3 → 10 is the
    // authority; user 3 spans both attrs → the hub
    val m = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L))
      .toDF("u", "a")
    val out = Graph.hitsBipartite(m, "u", "a", iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out(("auth", 10L)) == 1000000L, out.toString)
    assert(out(("auth", 20L)) < 1000000L, out.toString)
    assert(out(("hub", 3L)) == 1000000L, out.toString)
    assert(out(("hub", 1L)) == out(("hub", 2L)), out.toString)
    assert(out(("hub", 1L)) < 1000000L, out.toString)
  }

  test("hits is layout-independent and dedups duplicate memberships") {
    val m = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L), (3L, 20L))
      .toDF("u", "a")
    val a = Graph.hitsBipartite(m.repartition(1), "u", "a")
      .collect().map(_.toSeq)
    val b = Graph.hitsBipartite(m.repartition(5), "u", "a")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
