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

  // === Holt–Winters (w22) ==============================================

  private def runHw(cents: Seq[Long], period: Int, parts: Int = 1,
                    aNum: Int = 3, aDen: Int = 10,
                    bNum: Int = 3, bDen: Int = 10,
                    gNum: Int = 3, gDen: Int = 10) =
    Seasonal.holtWinters(frame(cents, parts), "event_type", "ts_us",
        "cents", period = period, aNum = aNum, aDen = aDen,
        bNum = bNum, bDen = bDen, gNum = gNum, gDen = gDen)
      .select("n_days", "level_fp", "trend_fp", "s_next_fp",
        "forecast1_fp", s"forecast${period}_fp")
      .as[(Long, Long, Long, Long, Long, Long)].head()

  /** The triple recursion as a plain loop (α = β = γ = 3/10, ring of
    * `period` slots, head = seasonal due next).
    */
  private def referenceHw(cents: Seq[Long],
                          period: Int): (Long, Long, Vector[Long]) = {
    var l = cents.head * S
    var b = 0L
    var ring = Vector.fill(period)(0L)
    cents.tail.foreach { y =>
      val sH = ring.head
      val l2 = (3L * (y * S - sH) + 7L * (l + b)) / 10L
      b = (3L * (l2 - l) + 7L * b) / 10L
      val s2 = (3L * (y * S - l2) + 7L * sH) / 10L
      ring = ring.tail :+ s2
      l = l2
    }
    (l, b, ring)
  }

  test("holt-winters hand-computed three-step series at period 2") {
    // y = [10, 20, 30]: consumed seasonals are all 0 (cold ring), so
    // l/b match plain Holt (13e6 -> 18.73e6, 0.9e6 -> 2.349e6); fresh
    // s2 = 3*(20e6-13e6)/10 = 2.1e6, s3 = 3*(30e6-18.73e6)/10 = 3.381e6
    assert(runHw(Seq(10L, 20L, 30L), period = 2) ==
      ((3L, 18730000L, 2349000L, 2100000L,
        18730000L + 2349000L + 2100000L,
        18730000L + 2L * 2349000L + 3381000L)))
  }

  test("holt-winters: cold ring (n <= period + 1) reduces to plain Holt " +
      "on level and trend") {
    val series = Seq(12L, -7L, 30L, 4L, 18L, -2L, 9L, 21L)
    val (l, b) = reference(series)
    val hw = runHw(series, period = 7)
    assert((hw._2, hw._3) == ((l, b)))
  }

  test("holt-winters lambda encoding matches the plain loop, " +
      "negatives included, seasonal ring exercised") {
    val rnd = new scala.util.Random(23)
    val series = Seq.fill(150)((rnd.nextInt(20001) - 10000).toLong)
    val (l, b, ring) = referenceHw(series, period = 3)
    val got = runHw(series, period = 3)
    assert(got == ((150L, l, b, ring.head,
      l + b + ring.head, l + 3L * b + ring.last)))
  }

  test("holt-winters is partitioning-invariant") {
    val series = Seq.fill(60)(scala.util.Random.nextInt(1000).toLong)
    assert(runHw(series, period = 7, parts = 1) ==
      runHw(series, period = 7, parts = 13))
  }

  test("holt-winters overflow guard fails loudly past the bound") {
    val bound = Seasonal.hwCentsBound(7)
    // the derivation (hwCentsBound doc): Int64 / S / maxCoef / (3h+1)
    assert(bound == Long.MaxValue / S / 7L / 49L)
    val ex = intercept[IllegalArgumentException] {
      runHw(Seq(bound + 1L), period = 7)
    }
    assert(ex.getMessage.contains("fold bound"))
  }

  /** Greedy adversarial series for the triple recursion: at each step
    * pick y = ±c to maximize the largest post-step state cell —
    * stronger than plain alternation (it chases whichever resonance
    * the (α,β,γ,p) filter has). BigInt arithmetic so the GENERATOR
    * can never wrap even when the trajectory diverges; returns the
    * chosen series and the worst |cell| reached.
    */
  private def greedyHwSeries(aNum: Long, aDen: Long, bNum: Long,
                             bDen: Long, gNum: Long, gDen: Long,
                             period: Int, c: Long,
                             steps: Int): (Seq[Long], BigInt) = {
    val cs = BigInt(c) * S
    var l = cs; var b = BigInt(0)
    var ring = Vector.fill(period)(BigInt(0))
    var worst = cs
    val ys = Vector.newBuilder[Long]
    ys += c
    (1 until steps).foreach { _ =>
      val cands = Seq(c, -c).map { y =>
        val sH = ring.head
        val l2 = (aNum * (BigInt(y) * S - sH) + (aDen - aNum) * (l + b)) / aDen
        val b2 = (bNum * (l2 - l) + (bDen - bNum) * b) / bDen
        val s2 = (gNum * (BigInt(y) * S - l2) + (gDen - gNum) * sH) / gDen
        (Seq(l2.abs, b2.abs, s2.abs).max, y, l2, b2, s2)
      }
      val (m, y, l2, b2, s2) = cands.maxBy(_._1)
      l = l2; b = b2; ring = ring.tail :+ s2
      worst = worst.max(m)
      ys += y
    }
    (ys.result(), worst)
  }

  test("triple-recursion adversarial drift stays within the 16x " +
      "envelope at the default ratios (ADVICE r12: the ring's y - s " +
      "feedback pinned, not assumed)") {
    Seq(2, 7).foreach { p =>
      val (series, worst) =
        greedyHwSeries(3, 10, 3, 10, 3, 10, p, 10000L, 500)
      assert(worst <= BigInt(16L) * 10000L * S,
        s"period $p: adversarial drift $worst past the 16x envelope")
      // and the op replays the BigInt shadow exactly — no wrap, no
      // spurious guard fire, ring fully engaged
      val got = runHw(series, period = p)
      val (l, bb, ring) = referenceHw(series, period = p)
      assert(got == ((series.size.toLong, l, bb, ring.head,
        l + bb + ring.head, l + p.toLong * bb + ring.last)))
    }
  }

  test("per-step drift guard fires loudly on an unstable ratio corner " +
      "instead of wrapping Int64 (ADVICE r12)") {
    // alpha = beta = gamma = 7/8 at p = 7 resonates: greedy drift
    // reaches ~65x the input bound — past the 16x envelope the input
    // guard budgets for, and 28x past Int64 under the OLD 16x-slack
    // bound (a silent wrap; DuckDB would have errored)
    val bound = Seasonal.hwCentsBound(7)
    val (series, worst) =
      greedyHwSeries(7, 8, 7, 8, 7, 8, 7, bound, 600)
    assert(worst > BigInt(16L) * bound * S,
      "corner no longer adversarial — pick a harder one")
    val ex = intercept[Exception] {
      runHw(series, period = 7, aNum = 7, aDen = 8, bNum = 7, bDen = 8,
        gNum = 7, gDen = 8)
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(ex).contains("drifted past"))
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
