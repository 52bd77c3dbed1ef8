package graft

import org.apache.spark.sql.functions._

import graft.functions.KllSketchAgg

/** Mergeable KLL-style quantile sketch (r10 verdict mandate #7):
  * exact below capacity, worst-case rank-error bound above it under
  * every partitioning / merge order, adversarial input orders
  * included.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private val percents = Seq(10, 25, 50, 75, 90, 99)

  /** Exact type-1 quantile (the a26/w13 rank rule): smallest v with
    * cumulative count >= ceil(p*n/100).
    */
  private def exactQ(sorted: IndexedSeq[Double], p: Int): Double = {
    val n = sorted.length.toLong
    val target = math.max(1L, (p.toLong * n + 99L) / 100L)
    sorted((target - 1).toInt)
  }

  private def sketchOf(vs: Seq[Double], cap: Int,
                       parts: Int): Map[Int, Double] =
    vs.toDF("v").repartition(parts)
      .agg(KllSketchAgg.kllQuantiles(col("v"), cap, percents).as("q"))
      .select(explode(col("q")).as("e"))
      .select(col("e.p"), col("e.est"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  test("below capacity the sketch is exact, any partitioning") {
    val vs = (1 to 400).map(i => ((i * 7919) % 401).toDouble)
    val sorted = vs.sorted.toIndexedSeq
    for (parts <- Seq(1, 4, 32)) {
      val got = sketchOf(vs, cap = 512, parts)
      percents.foreach(p => assert(got(p) == exactQ(sorted, p),
        s"p=$p parts=$parts"))
    }
  }

  test("rank-error bound holds on sorted/reversed/shuffled input " +
      "across partitionings") {
    val n = 50000
    val base = (1 to n).map(_.toDouble)
    val orders = Map(
      "sorted" -> base,
      "reversed" -> base.reverse,
      "shuffled" -> new scala.util.Random(7).shuffle(base))
    val cap = 512
    val bound = KllSketchAgg.rankErrorBound(cap, n.toLong)
    assert(bound > 0 && bound < n / 10, s"bound=$bound sane")
    for ((name, vs) <- orders; parts <- Seq(1, 16)) {
      val got = sketchOf(vs, cap, parts)
      percents.foreach { p =>
        val target = math.max(1L, (p.toLong * n + 99L) / 100L)
        // values are 1..n so the true rank of an estimate IS its value
        val rank = got(p).toLong
        assert(math.abs(rank - target) <= bound,
          s"$name parts=$parts p=$p est-rank=$rank target=$target " +
            s"bound=$bound")
      }
    }
  }

  test("constant and two-point distributions collapse correctly") {
    val const = sketchOf(Seq.fill(10000)(42.0), cap = 64, parts = 8)
    percents.foreach(p => assert(const(p) == 42.0))
    // 90% zeros, 10% ones: p50 must be 0, p99 must be 1 even after
    // heavy compaction (the bound is ~3% of n at cap 512)
    val vs = Seq.fill(45000)(0.0) ++ Seq.fill(5000)(1.0)
    val got = sketchOf(new scala.util.Random(3).shuffle(vs), 512, 16)
    assert(got(50) == 0.0 && got(99) == 1.0, got.toString)
  }

  test("grouped aggregation keeps sketches per group independent") {
    val df = (1 to 20000).map(i => (i % 3, i.toDouble)).toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(KllSketchAgg.kllQuantiles(col("v"), 512, Seq(50)).as("q"))
      .select(col("g"), explode(col("q")).as("e"))
      .select(col("g"), col("e.est"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // each group is ~6667 uniform values over (g, g+3, ...): medians
    // of the three groups must all sit near n/2 within the bound
    val bound = KllSketchAgg.rankErrorBound(512, 6667L) * 3 // value gap 3
    (0 to 2).foreach { g =>
      assert(math.abs(out(g) - 10000.0) <= bound + 3,
        s"g=$g median=${out(g)}")
    }
  }

  test("state serialize/deserialize round-trips and merges exactly") {
    val s1 = KllSketchAgg.State.empty()
    val s2 = KllSketchAgg.State.empty()
    (1 to 1000).foreach(i => s1.add(i.toDouble, 64))
    (1001 to 2000).foreach(i => s2.add(i.toDouble, 64))
    val bytes = s1.toBytes
    val s1b = KllSketchAgg.State.fromBytes(bytes)
    assert(s1b.count == s1.count &&
      s1b.totalWeight == s1.totalWeight)
    s1b.mergeIn(s2, 64)
    assert(s1b.count == 2000L)
    val bound = KllSketchAgg.rankErrorBound(64, 2000L)
    val est = s1b.quantiles(Seq(50)).head
    assert(math.abs(est - 1000.0) <= bound, s"est=$est bound=$bound")
  }
}
