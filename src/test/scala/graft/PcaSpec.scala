package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Power-iteration PCA — the iteration must find the dominant
  * eigenvector of a known covariance, satisfy the eigen equation, and
  * produce the same answer whether fed from the ordered (oracle twin)
  * or production (order-free) covariance — the n16b-style gate that
  * makes the 100-TB path an API, not prose.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim points stretched along (1,2,0,0): dominant eigenvector
  // ∝ (1,2,0,0)/√5, second axis (0,0,1,0) with much smaller variance
  lazy val stretched = (0 until 200).map { i =>
    val t = (i - 100).toDouble / 10.0
    val jitter = ((i * 37) % 11 - 5).toDouble / 50.0
    (i.toLong, Array(t * 1.0, t * 2.0, jitter, 0.1))
  }.toDF("vec_id", "embedding")

  test("recovers the dominant direction of a stretched cloud") {
    val out = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrixOrdered(stretched, "vec_id", "embedding"),
      rounds = 12).collect()
    assert(out.length == 4)
    val v = out.sortBy(_.getInt(0)).map(_.getDouble(1))
    val s = math.signum(v(0))
    assert(approx(s * v(0), 1.0 / math.sqrt(5.0), 1e-3), s"v0 ${v(0)}")
    assert(approx(s * v(1), 2.0 / math.sqrt(5.0), 1e-3), s"v1 ${v(1)}")
    assert(math.abs(v(2)) < 1e-2 && math.abs(v(3)) < 1e-2)
    // the stretch dominates: evr close to 1
    assert(out.head.getDouble(3) > 0.99, s"evr ${out.head.getDouble(3)}")
  }

  test("eigen equation: C·v = l1·v on the converged vector") {
    val cov = Similarity.covarianceMatrixOrdered(
      stretched, "vec_id", "embedding")
    val out = Similarity.pcaPowerFromCov(cov, rounds = 12).collect()
      .sortBy(_.getInt(0))
    val v = out.map(_.getDouble(1))
    val l1 = out.head.getDouble(2)
    val cells = cov.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def c(i: Int, j: Int) = cells.getOrElse((i min j, i max j), 0.0)
    for (i <- v.indices) {
      val cvI = v.indices.map(j => c(i, j) * v(j)).sum
      assert(math.abs(cvI - l1 * v(i)) < 1e-4,
        s"dim $i: Cv=$cvI l1*v=${l1 * v(i)}")
    }
  }

  test("production covariance feeds the same iteration (scale gate)") {
    val twin = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrixOrdered(stretched, "vec_id", "embedding"),
      rounds = 8).collect().sortBy(_.getInt(0))
    val prod = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrix(stretched, "embedding"),
      rounds = 8).collect().sortBy(_.getInt(0))
    twin.zip(prod).foreach { case (a, b) =>
      assert(approx(a.getDouble(1), b.getDouble(1), 1e-6))
      assert(approx(a.getDouble(2), b.getDouble(2), 1e-6))
    }
  }

  test("residual outliers: off-axis point tops, far-along-axis point " +
    "does not") {
    // cloud along (1,2,0,0); id 900 sits far ALONG the axis (large but
    // on-trend), id 901 sits far OFF it (the true outlier)
    val pts = ((0 until 100).map { i =>
      val t = (i - 50).toDouble / 10.0
      (i.toLong, Array(t, 2 * t, 0.0, 0.0))
    } :+ (900L, Array(30.0, 60.0, 0.0, 0.0))
      :+ (901L, Array(0.0, 0.0, 25.0, 0.0))).toDF("vec_id", "embedding")
    val load = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrixOrdered(pts, "vec_id", "embedding"),
      rounds = 12)
    val means = Similarity.dimMeansOrdered(pts, "vec_id", "embedding")
    val top = Similarity.pcaResidualOutliers(pts, "vec_id", "embedding",
      load, means, topK = 3).collect()
    assert(top.head.getLong(0) == 901L, top.mkString(","))
    assert(!top.map(_.getLong(0)).contains(900L), top.mkString(","))
  }

  test("residual outliers: production means/covariance arm agrees " +
    "with the ordered twin") {
    val loadT = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrixOrdered(stretched, "vec_id", "embedding"),
      rounds = 8)
    val meansT = Similarity.dimMeansOrdered(stretched, "vec_id", "embedding")
    val twin = Similarity.pcaResidualOutliers(stretched, "vec_id",
      "embedding", loadT, meansT, topK = 10).collect()
    val loadP = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrix(stretched, "embedding"), rounds = 8)
    val meansP = Similarity.dimMeans(stretched, "embedding")
    val prod = Similarity.pcaResidualOutliers(stretched, "vec_id",
      "embedding", loadP, meansP, topK = 10).collect()
    assert(twin.map(_.getLong(0)).toSeq == prod.map(_.getLong(0)).toSeq)
    twin.zip(prod).foreach { case (a, b) =>
      assert(approx(a.getDouble(1), b.getDouble(1), 1e-5)) }
  }

  test("l1 is bounded by the trace and evr is a valid share") {
    val out = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrixOrdered(stretched, "vec_id", "embedding"),
      rounds = 8).first()
    val l1 = out.getDouble(2)
    val evr = out.getDouble(3)
    assert(l1 > 0.0 && evr > 0.0 && evr <= 1.0, s"l1 $l1 evr $evr")
  }

  test("driver-local power iteration == the distributed loop, " +
      "bit for bit") {
    val cov = Similarity.covarianceMatrixOrdered(
      stretched, "vec_id", "embedding")
    val fast = Similarity.pcaPowerFromCov(cov, rounds = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    val cells = graft.ops.Layout.materializeBounded(
      Similarity.pcaPowerCells(cov), maxRows = 1L << 20)
    val slow = Similarity.pcaPowerDistributed(cells, rounds = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(fast.toSeq == slow.toSeq)
  }
}
