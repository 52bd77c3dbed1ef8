package graft

import graft.ops.Clustering

/** Integer fixed-point Lloyd's: init rule, assignment ties, truncated
  * means, inertia, empty-cluster handling.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("two well-separated groups converge to their exact means") {
    // x ∈ {0,1} and {10,11}: init (min 0, max 11, k=2) puts c0=2, c1=8;
    // first update lands c0=0 (truncated (0+1)/2), c1=10
    val pts = Seq((0L, 0L), (1L, 0L), (10L, 0L), (11L, 0L)).toDF("x", "y")
    val out = Clustering.kmeansExact2d(pts, "x", "y", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(0L) == ((2L, 0L, 0L, 1.0)), out.toString)
    assert(out(1L) == ((2L, 10L, 0L, 1.0)), out.toString)
  }

  test("duplicate points weight the truncated mean") {
    // {0 ×3, 9}: one cluster → cx = (0·3 + 9) div 4 = 2
    val pts = Seq((0L, 0L), (0L, 0L), (0L, 0L), (9L, 0L)).toDF("x", "y")
    val out = Clustering.kmeansExact2d(pts, "x", "y", k = 2, iters = 3)
      .collect()
    val total = out.map(_.getLong(1)).sum
    assert(total == 4L, out.mkString(","))
  }

  test("a centroid that attracts no points drops out consistently") {
    // {0, 10} with k=3: the middle init centroid is never nearest
    val pts = Seq((0L, 0L), (10L, 0L)).toDF("x", "y")
    val out = Clustering.kmeansExact2d(pts, "x", "y", k = 3, iters = 2)
      .collect()
    assert(out.length == 2, out.mkString(","))
    assert(out.map(_.getLong(1)).forall(_ == 1L))
    assert(out.map(_.getDouble(4)).forall(_ == 0.0), "converged exactly")
  }

  test("assignment tie at equal distance goes to the lower centroid " +
      "index") {
    // {0,2,4}, k=2: init c0 = 0+(1*4) div 4 = 1, c1 = 0+(3*4) div 4 = 3;
    // x=2 is equidistant (d2 = 1 to both) -> tie to j=0
    val pts = Seq((0L, 0L), (2L, 0L), (4L, 0L)).toDF("x", "y")
    val out = Clustering.kmeansExact2d(pts, "x", "y", k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 1L -> 1L), out.toString)
  }
}
