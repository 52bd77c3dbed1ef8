package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bootstrap, Velocity}

class VelocitySpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // 1h in µs

  test("trailing: hand-computed counts, boundary exactness, peers, key isolation") {
    // user 1: t=0, t=H-1 (inside the frame of the first — exactly at
    // the trailing edge), t=H (t=0 has aged out by exactly one µs).
    // user 2: two peer rows at the same timestamp see each other.
    val df = Seq(
      (1L, 0L, 10.0), (1L, H - 1, 5.0), (1L, H, 2.0),
      (2L, 0L, 1.0), (2L, 0L, 3.0)).toDF("u", "t", "v")
    val out = Velocity.trailing(df, "u", "t", "v", H)
      .select($"u", $"t", $"vel_n", $"vel_sum".cast("double"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((1L, 0L)) == ((1L, 10.0)))
    assert(out((1L, H - 1)) == ((2L, 15.0)))   // t=0 still inside
    assert(out((1L, H)) == ((2L, 7.0)))        // t=0 aged out, H-1 inside
    assert(out((2L, 0L)) == ((2L, 4.0)))       // peers include each other
  }

  test("trailing: null values sum as null-when-all-null, count still rows") {
    val df = Seq((1L, 0L, None: Option[Double]),
      (1L, 1L, Some(2.0))).toDF("u", "t", "v")
    val out = Velocity.trailing(df, "u", "t", "v", H)
      .select($"t", $"vel_n", $"vel_sum".cast("double").as("s"))
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == ((1L, None)))
    assert(out(1L) == ((2L, Some(2.0))))
  }

  test("cusumFinal: hand fold, alarm reset, downward side, boundary strict") {
    import graft.ops.Velocity
    // key 1, target 10.00, h 5.00 (cents 1000/500): [12, 14, 11] →
    // s+ 200, then 600 > 500 ALARM (reset), then 100; key 2 downward:
    // [5, 4] → s- 500 (NOT > 500: the crossing is strict), then
    // 1100 > 500 alarm and reset
    val df = Seq(
      (1L, 10L, 1L, 12.0), (1L, 20L, 2L, 14.0), (1L, 30L, 3L, 11.0),
      (2L, 10L, 4L, 5.0), (2L, 20L, 5L, 4.0)
    ).toDF("k", "t", "i", "v")
    val got = Velocity.cusumFinal(df, "k", "t", "i", "v",
      targetCents = 1000L, hCents = 500L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) == ((3L, 1L, 100L, 0L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 0L, 0L)), s"got ${got(2L)}")
  }

  test("ewmaFinal: hand fold, tie order, key isolation, null drop") {
    import graft.ops.Velocity
    // key a, ts order [8, 16, 24] with α=1/4: 8 → 8·.75+16·.25=10 →
    // 10·.75+24·.25=13.5; key b single value seeds itself; ts tie at
    // t=5 resolved by id (id 1 before id 2); null value rows drop
    val df = Seq(
      (1L, 10L, 1L, 8.0), (1L, 20L, 2L, 16.0), (1L, 30L, 3L, 24.0),
      (2L, 10L, 4L, 42.0),
      (3L, 5L, 1L, 0.0), (3L, 5L, 2L, 8.0)
    ).toDF("k", "t", "i", "v")
      .union(Seq((4L, Option(1L), Option(5L), Option.empty[Double]))
        .toDF("k", "t", "i", "v"))
    val got = Velocity.ewmaFinal(df, "k", "t", "i", "v", 1, 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3L, 13.5)))
    assert(got(2L) == ((1L, 42.0)))
    assert(got(3L) == ((2L, 0.0 * 0.75 + 0.25 * 8.0))) // tie: id 1 first
    assert(!got.contains(4L), "all-null-value key drops entirely")
    // non-dyadic alpha denominator rejected (exactness contract)
    intercept[IllegalArgumentException] {
      Velocity.ewmaFinal(df, "k", "t", "i", "v", 1, 10)
    }
  }

  test("burst flags at-or-above the threshold") {
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 1.0), (1L, 2L, 1.0)).toDF("u", "t", "v")
    val flagged = Velocity.trailing(df, "u", "t", "v", H)
      .filter(Velocity.burst("vel_n", 3L)).count()
    assert(flagged == 1L) // only the third row's trailing count reaches 3
  }
}

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("thresholds are 10 monotone fixed-width hex breakpoints, c0 = e^-1") {
    val t = Bootstrap.thresholdsHex
    assert(t.size == 10)
    assert(t.forall(h => h.length == 8 && h.matches("[0-9a-f]{8}")))
    assert(t == t.sorted && t.distinct == t)
    assert(java.lang.Long.parseLong(t.head, 16) ==
      math.floor(math.exp(-1.0) * 4294967296.0).toLong)
  }

  test("weights are Poisson(1)-distributed: mean ~1, P(0) ~ e^-1") {
    val n = 20000
    val df = (1 to n).map(i => ("g", i.toLong, 1.0)).toDF("g", "id", "v")
    val w = Bootstrap.bootMeans(df, "g", "id", "v", reps = 1)
      .select($"n_eff").as[Long].head()
    // n_eff = Σ Poisson(1) over 20k draws: mean n, sd ~ sqrt(n) ≈ 141
    assert(math.abs(w - n) < 6 * math.sqrt(n.toDouble), s"n_eff=$w")
  }

  test("constant-value group: every replicate mean is exactly the constant") {
    val df = (1 to 500).map(i => ("g", i.toLong, 7.25)).toDF("g", "id", "v")
    val means = Bootstrap.bootMeans(df, "g", "id", "v", reps = 16)
      .select($"boot_mean").as[Option[Double]].collect()
    assert(means.length == 16)
    assert(means.forall(_.contains(7.25)))
  }

  test("replicates are deterministic and actually vary across reps") {
    val df = (1 to 300).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    def run() = Bootstrap.bootMeans(df, "g", "id", "v", reps = 8)
      .orderBy($"rep").select($"boot_mean").as[Double].collect().toSeq
    val a = run()
    assert(a == run(), "not deterministic across runs")
    assert(a.distinct.size > 1, "replicates degenerate")
    // sampling distribution centers near the true mean 150.5
    val grand = a.sum / a.size
    assert(math.abs(grand - 150.5) < 15, s"grand=$grand")
  }

  test("rollingActives: dau/wau over trailing windows, facts dedupe") {
    val us = 86400000000L
    // user 1 on days 0 and 2 (day-2 twice: must dedupe), user 3 on
    // day 0 only, user 2 on day 2, user 4 far later on day 20
    val ev = Seq((1L, 0L * us), (3L, 0L * us), (1L, 2L * us),
      (1L, 2L * us + 5L), (2L, 2L * us), (4L, 20L * us))
      .toDF("u", "t")
    val got = Velocity.rollingActives(ev, "u", "t", windowDays = 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // only observed days are reported
    assert(got.keySet == Set(0L, 2L, 20L), got.toString)
    assert(got(0L) == ((2L, 2L, 1.0)), got.toString)
    // day 2 window [-4, 2] sees users {1, 2, 3}
    assert(got(2L)._1 == 2L && got(2L)._2 == 3L, got.toString)
    assert(math.abs(got(2L)._3 - 2.0 / 3.0) < 1e-6)
    // day 20 is beyond every earlier window
    assert(got(20L) == ((1L, 1L, 1.0)), got.toString)
  }
}
