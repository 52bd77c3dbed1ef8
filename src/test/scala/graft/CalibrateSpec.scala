package graft

import org.apache.spark.sql.functions._

import graft.ops.Calibrate

/** PAV isotonic fit — hand pools, monotonicity, mass conservation. */
class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, Int)]) =
    Calibrate.isotonicFit(rows.toDF("s", "y"), "s", "y")
      .orderBy(col("score"))
      .as[(Long, Long, Long, Double)].collect()

  test("adjacent violator pools to the block mean") {
    // bucket rates 0.5, 0.0, 1.0 → first two pool to 1/4
    val rows = Seq((0L, 1), (0L, 0), (1L, 0), (1L, 0), (2L, 1))
    assert(fit(rows).toSeq == Seq((0L, 2L, 1L, 0.25), (1L, 2L, 0L, 0.25),
      (2L, 1L, 1L, 1.0)))
  }

  test("already-monotone rates pass through untouched") {
    val rows = Seq((0L, 0), (0L, 0), (1L, 0), (1L, 1), (2L, 1))
    assert(fit(rows).toSeq == Seq((0L, 2L, 0L, 0.0), (1L, 2L, 1L, 0.5),
      (2L, 1L, 1L, 1.0)))
  }

  test("a full reversal pools everything to the global mean") {
    val rows = Seq((0L, 1), (1L, 1), (2L, 0), (3L, 0))
    assert(fit(rows).map(_._4).toSeq == Seq(0.5, 0.5, 0.5, 0.5))
  }

  test("fitted is monotone and conserves label mass on noisy data") {
    // deterministic noisy score: rate roughly rises with s but jitters
    val rows = (0 until 2000).map { i =>
      val s = (i % 20).toLong
      val y = if ((i * 2654435761L >>> 7) % 20 < s + 3) 1 else 0
      (s, y)
    }
    val out = fit(rows)
    assert(out.sliding(2).forall(p => p(0)._4 <= p(1)._4), "monotone")
    val mass = out.map(r => r._4 * r._2).sum
    val ySum = out.map(_._3).sum.toDouble
    assert(math.abs(mass - ySum) < 1e-6, s"mass $mass vs $ySum")
  }
}
