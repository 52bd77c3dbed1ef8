package graft

import org.apache.spark.sql.functions._
import graft.ops.Journey

class JourneySpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000000L

  test("transitionMatrix: hand counts, row normalization, tie order") {
    import graft.ops.Journey
    // user 1: A→B→A (ts order); user 2: A→B; first events drop.
    // pairs: (A,B)×2, (B,A)×1; rows: A→{B:1.0}, B→{A:1.0}… with both
    // users: (A,B) n=2 p=1.0, (B,A) n=1 p=1.0
    val df = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "A"),
      (2L, 10L, 4L, "A"), (2L, 20L, 5L, "B"),
      // user 3: ts tie resolved by id: C(id 6) then D(id 7) → (C,D)
      (3L, 5L, 6L, "C"), (3L, 5L, 7L, "D")
    ).toDF("u", "t", "i", "s")
    val got = Journey.transitionMatrix(df, "u", "t", "i", "s")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(("A", "B") -> ((2L, 1.0)), ("B", "A") -> ((1L, 1.0)),
      ("C", "D") -> ((1L, 1.0))))
  }

  test("impossibleTravel: hand haversine, speed rule, teleport, jitter") {
    import graft.ops.Journey
    val HOUR = 3600000000L
    val df = Seq(
      // user 1: (0,0) → (0,90) in 1h = quarter circumference → flagged
      (1L, 0L, 1L, 0.0, 0.0), (1L, HOUR, 2L, 0.0, 90.0),
      // user 2: same-spot replay → km 0, never flagged
      (2L, 0L, 3L, 10.0, 10.0), (2L, HOUR, 4L, 10.0, 10.0),
      // user 3: distinct locations at the same instant → teleport flag
      (3L, 0L, 5L, 0.0, 0.0), (3L, 0L, 6L, 50.0, 50.0),
      // user 4: ~111 m GPS jitter in 1 s → under the 1 km floor
      (4L, 0L, 7L, 0.0, 0.0), (4L, 1000000L, 8L, 0.0, 0.001)
    ).toDF("u", "t", "i", "lat", "lon")
    val got = Journey.impossibleTravel(df, "u", "t", "i", "lat", "lon")
      .collect().map { r =>
        r.getLong(0) -> (r.getAs[Double]("km"),
          r.getAs[Boolean]("impossible"))
      }.toMap
    assert(got.size == 4, "one hop per 2-event user")
    assert(approx(got(1L)._1, 6371.0 * math.Pi / 2, 1e-6) && got(1L)._2)
    assert(got(2L)._1 == 0.0 && !got(2L)._2)
    assert(got(3L)._2, "zero-dt teleport must flag")
    assert(got(4L)._1 < 1.0 && !got(4L)._2)
  }

  test("cohortRetention: hand-computed matrix, boundary lands in the later bucket") {
    // u1 first touch day 0, active days 0 and 2; u2 first touch day 1,
    // active day 1 twice (dedup to one) and day 2; u3 exactly at the
    // day-1 boundary (t = DAY) → cohort 1, not 0.
    val df = Seq(
      (1L, 0L), (1L, 2 * DAY + 5), (2L, DAY + 3), (2L, DAY + 9),
      (2L, 2 * DAY), (3L, DAY)).toDF("u", "t")
    val out = Journey.cohortRetention(df, "u", "t", DAY)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      (0L, 0L) -> 1L, (0L, 2L) -> 1L,          // u1
      (1L, 0L) -> 2L,                          // u2 + boundary u3
      (1L, 1L) -> 1L))                         // u2 on day 2
  }

  test("cohortRetention: pre-epoch timestamps floor (not truncate)") {
    val df = Seq((1L, -1L), (1L, 0L)).toDF("u", "t")
    val out = Journey.cohortRetention(df, "u", "t", DAY)
      .as[(Long, Long, Long)].collect().toSet
    // t=-1 is day -1 (floor), so cohort -1, offsets 0 and 1
    assert(out == Set((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("funnel: ordering enforced, lags exact, same-instant chain converts") {
    // A: view@0, click@10, purchase@5 → purchase precedes click, stops
    //    at stage 1 with lag 10.
    // B: view@0, click@5, purchase@20 → full funnel, lags 5 and 15.
    // C: click only → never enters (no stage-0 event).
    // D: view/click/purchase all @7 → full funnel, lags 0.
    val df = Seq(
      ("A", 0L, "view"), ("A", 10L, "click"), ("A", 5L, "purchase"),
      ("B", 0L, "view"), ("B", 5L, "click"), ("B", 20L, "purchase"),
      ("C", 3L, "click"),
      ("D", 7L, "view"), ("D", 7L, "click"), ("D", 7L, "purchase"))
      .toDF("u", "t", "et")
    val out = Journey.funnel(df, "u", "t", Seq(
        "view" -> ($"et" === "view"),
        "click" -> ($"et" === "click"),
        "purchase" -> ($"et" === "purchase")))
      .orderBy($"stage_idx")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (0L, "view", 3L, None),            // A, B, D
      (1L, "click", 3L, Some(15L)),      // lags A=10, B=5, D=0
      (2L, "purchase", 2L, Some(15L))))  // lags B=15, D=0
  }

  test("funnel: single stage degenerates to first-touch count") {
    val df = Seq(("A", 1L, "x"), ("A", 2L, "x"), ("B", 9L, "y"))
      .toDF("u", "t", "et")
    val out = Journey.funnel(df, "u", "t",
        Seq("x" -> ($"et" === "x")))
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(out == Seq((0L, "x", 1L, None)))
  }

  test("sessionize: boundary gap splits, ties share, keys isolate") {
    // gap = 100: A's events at 0, 50 (same session, gap 50), 150
    // (gap exactly 100 → NEW session — the inclusive >= rule matching
    // session_window's close), 150 again (tie, gap 0 → same), 249
    // (gap 99 → same). B has one event (session 0, null gap).
    val df = Seq(("A", 0L), ("A", 50L), ("A", 150L), ("A", 150L),
      ("A", 249L), ("B", 7L)).toDF("u", "t")
    val out = Journey.sessionize(df, "u", "t", gapMicros = 100L)
      .as[(String, Long, Option[Long], Long)] // u, t, gap_us, session_idx
      .collect().toSet
    assert(out === Set(
      ("A", 0L, None, 0L), ("A", 50L, Some(50L), 0L),
      ("A", 150L, Some(100L), 1L), ("A", 150L, Some(0L), 1L),
      ("A", 249L, Some(99L), 1L), ("B", 7L, None, 0L)))
  }

  test("sessionize: per-session rollup agrees with session_window") {
    // the assignment form must reproduce session_window's aggregate
    // view on a multi-user frame with out-of-order input
    val gap = 1800000000L // 30 min in µs
    val rows = for (u <- 1L to 5L; i <- 0L until 20L) yield
      (u, i / 7 * (gap + u * 1000L) + i * 60000000L) // 3 bursts per user
    val df = spark.createDataFrame(
      scala.util.Random.shuffle(rows).toList).toDF("u", "t")
    val viaAssign = Journey.sessionize(df, "u", "t", gap)
      .groupBy($"u", $"session_idx").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)), sum($"n"), max($"n"))
      .as[(Long, Long, Long)].head()
    val viaWindow = df
      .withColumn("ts", timestamp_micros($"t"))
      .groupBy(session_window($"ts", "30 minutes"), $"u")
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)), sum($"n"), max($"n"))
      .as[(Long, Long, Long)].head()
    assert(viaAssign === viaWindow)
  }

  test("rfmSegments: equidepth value scores, recency reversed, ties share") {
    val us = 86400000000L
    // five users, one purchase each on days 10..14, spend 100..500
    // cents: recency/monetary fully distinct → scores 1..5; frequency
    // all tied at 1 → everyone shares f_score 1
    val ev = (0 until 5).map(i =>
      (i.toLong, (10L + i) * us, (i + 1) * 100L)).toDF("u", "t", "cents")
    val got = Journey.rfmSegments(ev, "u", "t", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // user i: day 10+i (recency rank i from most recent = 4-i),
    // monetary rank i → m_score i+1; r_score = 6 - (1 + (4-i)) = i+1
    assert(got.keySet == (1 to 5).map(i => (i.toLong, 1L, i.toLong)).toSet,
      got.toString)
    assert(got((5L, 1L, 5L)) == ((1L, 500L)), got.toString)
    assert(got((1L, 1L, 1L)) == ((1L, 100L)), got.toString)
  }

  test("geoRadiusSelfJoin ≡ brute force, incl. pole and antimeridian") {
    // near-pole pair (longitudes 180° apart but ~44 km over the top),
    // antimeridian pair (±179.9°, ~22 km), a mid-latitude pair, and an
    // isolated point — the three classic lat/lon-tile failure modes
    // the chord grid must survive
    val pts = Seq(
      (1L, 89.9, 10.0), (2L, 89.9, -170.0),
      (3L, 0.0, 179.9), (4L, 0.0, -179.9),
      (5L, 0.0, 0.0), (6L, 1.0, 1.0),
      (7L, -45.0, 100.0))
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)) = {
      val toRad = math.Pi / 180.0
      val dLat = (b._2 - a._2) * toRad
      val dLon = (b._3 - a._3) * toRad
      val h = math.sin(dLat / 2) * math.sin(dLat / 2) +
        math.cos(a._2 * toRad) * math.cos(b._2 * toRad) *
          math.sin(dLon / 2) * math.sin(dLon / 2)
      2.0 * 6371.0 * math.asin(math.sqrt(h))
    }
    val want = (for {
      a <- pts; b <- pts if a._1 < b._1
      d = hav(a, b) if d <= 300.0
    } yield (a._1, b._1)).toSet
    assert(want == Set((1L, 2L), (3L, 4L), (5L, 6L)), want.toString)
    val got = Journey.geoRadiusSelfJoin(
      pts.toDF("pid", "lat", "lon"), "pid", "lat", "lon", 300.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got=$got want=$want")
  }

  test("geoRadiusSelfJoin at a tight radius keeps only the closest pair") {
    // 3/4 are ~22 km apart; radius 25 keeps them, drops everything else
    val pts = Seq((3L, 0.0, 179.9), (4L, 0.0, -179.9),
      (5L, 0.0, 0.0), (6L, 1.0, 1.0)).toDF("pid", "lat", "lon")
    val got = Journey.geoRadiusSelfJoin(pts, "pid", "lat", "lon", 25.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.map(_._1).toSet == Set((3L, 4L)), got.mkString(","))
    assert(math.abs(got.head._2 - 22.24) < 0.1, got.head._2.toString)
  }

  test("sequencePairs: subsequence semantics, strict precedence, " +
    "same-type repeats") {
    val ev = Seq(
      (1L, 1L, "A"), (1L, 5L, "B"),              // A→B for u1, not B→A
      (2L, 3L, "A"), (2L, 3L, "B"),              // ties carry no order
      (3L, 1L, "A"), (3L, 2L, "A"),              // repeat → A→A
      (4L, 4L, "A"),                             // single A: no A→A
      (5L, 1L, "A"), (5L, 2L, "C"), (5L, 9L, "B") // gap still counts A→B
    ).toDF("u", "ts", "t")
    val got = Journey.sequencePairs(ev, "u", "ts", "t", minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((("A"), ("B"))) == 2L, got) // u1 and u5
    assert(!got.contains(("B", "A")), got)
    assert(got(("A", "A")) == 1L, got)     // u3 only
    assert(got(("A", "C")) == 1L && got(("C", "B")) == 1L, got)
    // confidence of A→B: 2 of the 5 users with an A
    val conf = Journey.sequencePairs(ev, "u", "ts", "t", minSupport = 1L)
      .filter(col("ante") === "A" && col("cons") === "B")
      .first().getDouble(3)
    assert(math.abs(conf - 0.4) < 1e-9, conf.toString)
  }

  test("kaplanMeier: hand-computed curve, censoring holds survival, " +
    "exhausted risk pins zero") {
    // durations: event@1, censored@2, two events@3
    val subj = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1)).toDF("dur", "ev")
    val km = Journey.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // t=1: 4 at risk, 1 event → S = 3/4
    assert(km(1L)._1 == 4L && km(1L)._2 == 1L)
    assert(math.abs(km(1L)._4 - 0.75) < 1e-6, km.toString)
    // t=2: censoring leaves the risk set WITHOUT dropping survival
    assert(km(2L)._3 == 1L && km(2L)._2 == 0L)
    assert(math.abs(km(2L)._4 - 0.75) < 1e-6, km.toString)
    // t=3: both remaining fail → survival exactly 0, no ln(0)
    assert(km(3L)._1 == 2L && km(3L)._2 == 2L && km(3L)._4 == 0.0,
      km.toString)
  }
}
