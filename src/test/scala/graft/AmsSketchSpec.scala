package graft

import org.apache.spark.sql.functions._

import graft.functions.AmsSketchAgg

/** AMS tug-of-war sketch: the counters are a LINEAR function of the
  * item counts, so any partitioning/merge order yields BIT-identical
  * state; the mean-of-squares estimates F₂; the sign hash matches the
  * oracle's SQL algebra.
  */
class AmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def counters(items: Seq[Long], r: Int,
                       parts: Int): Seq[Long] =
    items.toDF("i").repartition(parts)
      .agg(AmsSketchAgg.amsSketch(col("i"), r).as("z"))
      .select(col("z")).head().getSeq[Long](0)

  test("linear: identical counters under any partitioning and order") {
    val items = (1L to 500L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i))
    val ref = counters(items, r = 64, parts = 1)
    for (parts <- Seq(3, 32)) {
      assert(counters(new scala.util.Random(7).shuffle(items),
        64, parts) == ref, s"parts=$parts")
    }
  }

  test("counters match the reference sign algebra exactly") {
    val items = Seq(5L, 5L, -3L, 1000000007L, 0L)
    val got = counters(items, r = 8, parts = 2)
    val want = (0 until 8).map { j =>
      items.map { x =>
        val xf = ((x % AmsSketchAgg.P) + AmsSketchAgg.P) % AmsSketchAgg.P
        AmsSketchAgg.sign(xf, j)
      }.sum
    }
    assert(got == want)
  }

  test("mean of squares estimates F2 within 3x on a skewed stream") {
    // F2-heavy: one item with 1000 hits + 1000 singletons
    val items = Seq.fill(1000)(42L) ++ (10000L until 11000L)
    val f2 = 1000L * 1000L + 1000L
    val z = counters(items, r = 256, parts = 8)
    val est = z.map(v => v.toDouble * v).sum / z.length
    assert(est > f2 / 3.0 && est < f2 * 3.0,
      s"est=$est f2=$f2 (r=256 should land well within 3x)")
  }

  test("empty input and nulls") {
    val z = Seq.empty[Long].toDF("i")
      .agg(AmsSketchAgg.amsSketch(col("i"), 16).as("z"))
      .head().getSeq[Long](0)
    assert(z == Seq.fill(16)(0L))
    val z2 = Seq[java.lang.Long](java.lang.Long.valueOf(1L), null)
      .toDF("i")
      .agg(AmsSketchAgg.amsSketch(col("i"), 4).as("z"))
      .head().getSeq[Long](0)
    assert(z2.map(math.abs) == Seq.fill(4)(1L)) // the null contributed 0
  }
}
