package graft

import org.apache.spark.sql.functions._

import graft.ops.Seasonal

/** Holt linear-trend fixed-point fold: hand-computed steps, a plain
  * Scala-loop cross-check of the aggregate-lambda encoding, and
  * partitioning invariance.
  */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L
  private val Day = 86400000000L

  /** (group, day, cents) rows lifted to the op's input shape. */
  private def frame(cents: Seq[Long], parts: Int = 1) =
    cents.zipWithIndex
      .map { case (c, i) => ("g", i * Day + 7L, c) }
      .toDF("event_type", "ts_us", "cents")
      .repartition(parts)

  private def run(cents: Seq[Long], parts: Int = 1): (Long, Long, Long, Long) =
    Seasonal.holtLinear(frame(cents, parts), "event_type", "ts_us", "cents")
      .select("n_days", "level_fp", "trend_fp", "forecast7_fp")
      .as[(Long, Long, Long, Long)].head()

  /** The recursion as a plain loop — the oracle the lambda encoding
    * must match (alpha = beta = 3/10, S = 1e6, toward-zero div).
    */
  private def reference(cents: Seq[Long]): (Long, Long) = {
    var l = cents.head * S
    var b = 0L
    cents.tail.foreach { y =>
      val l2 = (3L * y * S + 7L * (l + b)) / 10L
      b = (3L * (l2 - l) + 7L * b) / 10L
      l = l2
    }
    (l, b)
  }

  test("hand-computed three-step series") {
    // y = [10, 20, 30]: l = 10e6 -> 13e6 -> 18.73e6; b = 0 -> 0.9e6
    // -> 2.349e6; forecast7 = 18.73e6 + 7 * 2.349e6
    assert(run(Seq(10L, 20L, 30L)) ==
      ((3L, 18730000L, 2349000L, 35173000L)))
  }

  test("single-point series keeps the seed") {
    assert(run(Seq(42L)) == ((1L, 42000000L, 0L, 42000000L)))
  }

  test("lambda encoding matches the plain loop, negatives included") {
    val rnd = new scala.util.Random(11)
    val series = Seq.fill(150)((rnd.nextInt(20001) - 10000).toLong)
    val (l, b) = reference(series)
    assert(run(series) == ((150L, l, b, l + 7L * b)))
  }

  test("partitioning-invariant (sorted fold, not arrival order)") {
    val series = Seq.fill(60)(scala.util.Random.nextInt(1000).toLong)
    assert(run(series, parts = 1) == run(series, parts = 13))
  }

  test("overflow guard: a daily sum past holtCentsBound fails loudly " +
      "(ADVICE r11)") {
    val bound = Seasonal.holtCentsBound(3, 10)
    assert(bound == Long.MaxValue / S / 7L / 16L)
    // at the bound: builds and runs
    assert(run(Seq(bound, -bound))._1 == 2L)
    // one past it: loud, before the fold
    val ex = intercept[IllegalArgumentException] {
      run(Seq(bound + 1L))
    }
    assert(ex.getMessage.contains("fold bound"))
  }

  test("transient-drift headroom: |l|+|b| stays within 8x the data " +
      "swing on a worst-case alternating series (the guard's 16x slack)") {
    // the adversarial input for a smoother: full-amplitude alternation
    val c = 10000L
    val series = (0 until 400).map(i => if (i % 2 == 0) c else -c)
    var l = series.head * S
    var b = 0L
    var worst = math.abs(l) + math.abs(b)
    series.tail.foreach { y =>
      val l2 = (3L * y * S + 7L * (l + b)) / 10L
      b = (3L * (l2 - l) + 7L * b) / 10L
      l = l2
      worst = math.max(worst, math.abs(l) + math.abs(b))
    }
    assert(worst <= 8L * c * S,
      s"|l|+|b| reached $worst > ${8L * c * S}")
  }
}
