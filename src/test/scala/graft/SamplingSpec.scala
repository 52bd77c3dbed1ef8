package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic sampling invariants (XXH64 fast mode; the portable md5
  * mode is oracle-gated via sm01/sm02).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = (1L to 5000L)
    .map(i => (i, s"grp${i % 7}")).toDF("id", "grp")

  test("hashSample is deterministic and near the requested fraction") {
    val a = Sampling.hashSample(base, "id", 0.2).select("id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(base, "id", 0.2).select("id")
      .as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 1000) < 120, s"got ${a.size}")
  }

  test("weightedSample portable mode ≡ a driver-side A-ES reference") {
    val rows = (1L to 800L).map(i => (i, 1L + (i % 13) * 7L))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 100,
      portable = true).select("id").as[Long].collect().toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = rows.map { case (id, w) =>
      val v = java.lang.Long.parseLong(md5hex(s"42:$id").take(13), 16)
      val u = (v.toDouble + 0.5) / 4503599627370496.0
      (math.log(u) / w.toDouble, id)
    }.sortBy { case (p, id) => (-p, id) }.take(100).map(_._2).toSet
    assert(got == expect)
  }

  test("weightedSamplePerGroup ≡ per-stratum weightedSample, isolation") {
    val rows = (1L to 600L).map(i => (i, s"g${i % 3}", 1L + (i % 11) * 5L))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedSamplePerGroup(df, "grp", "id", "w",
        n = 20, portable = true)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    // per-group equivalence with the global op applied to that stratum
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sampling.weightedSample(df.filter($"grp" === g),
          "id", "w", k = 20, portable = true)
        .select("id").as[Long].collect().toSet
      assert(got(g) == solo, s"stratum $g diverged from the global op")
    }
    assert(got.values.map(_.size).toSeq.forall(_ == 20))
  }

  test("weightedSample: heavy rows dominate, k≥n keeps all positives") {
    // 500 light rows (w=1) vs 50 heavy rows (w=1000): a k=50 sample
    // must be mostly heavy — inclusion odds scale with weight
    val df = ((1L to 500L).map(i => (i, 1L)) ++
      (1001L to 1050L).map(i => (i, 1000L))).toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect()
    assert(kept.count(_ > 1000L) >= 40, s"heavy=${kept.count(_ > 1000L)}")
    // k >= n: every positive-weight row survives; w<=0 / null never drawn
    val edge = Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("id", "w")
      .union(Seq((4L, Option.empty[Long])).toDF("id", "w"))
    val all = Sampling.weightedSample(edge, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L))
    // layout invariance: the draw is a pure row function
    val a = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("assignSplit is a total, deterministic, layout-invariant partition") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Sampling.assignSplit(base, "id", fr)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000, "every row lands in exactly one split")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 4000) < 200, counts.toString)
    assert(math.abs(counts("val") - 500) < 100, counts.toString)
    // layout invariance: identical per-row assignment after repartition
    val s2 = Sampling.assignSplit(base.repartition(13), "id", fr)
    assert(s1.select("id", "split").except(s2.select("id", "split"))
      .count() == 0)
    // weights need not be normalized: 8/1/1 ≡ 0.8/0.1/0.1
    val s3 = Sampling.assignSplit(base, "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    assert(s1.select("id", "split").except(s3.select("id", "split"))
      .count() == 0)
  }

  test("mixCorpus hits the target mixture; binding source keeps all rows") {
    val weights = Map("grp0" -> 0.5, "grp1" -> 0.25, "grp2" -> 0.25)
    val mixed = Sampling.mixCorpus(base, "grp", "id", weights)
    val got = mixed.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = base.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("grp0", "grp1", "grp2"), "unweighted drop")
    // all weighted sources are ~equal-sized, so grp0 (largest weight
    // relative to size) binds and keeps everything
    assert(got("grp0") == full("grp0"), "binding source must keep all")
    // half-weight sources sample to ~half the binding source
    for (g <- Seq("grp1", "grp2"))
      assert(math.abs(got(g) - got("grp0") / 2.0) < got("grp0") * 0.15,
        s"$g ${got(g)} vs ${got("grp0")}")
    // deterministic
    val again = Sampling.mixCorpus(base.repartition(11), "grp", "id", weights)
    assert(mixed.select("id").except(again.select("id")).count() == 0)
  }

  test("mixCorpusTemperature: α=1 identity, α=0 equalizes, α=.5 between") {
    // skewed corpus: one dominant source, one mid, one tail
    val skewed = ((1L to 4000L).map(i => (i, "big")) ++
      (4001L to 5000L).map(i => (i, "mid")) ++
      (5001L to 5250L).map(i => (i, "small"))).toDF("id", "grp")
    def counts(alpha: Double) =
      Sampling.mixCorpusTemperature(skewed, "grp", "id", alpha)
        .groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=1: proportions already match the corpus → every source binds
    assert(counts(1.0) == Map("big" -> 4000L, "mid" -> 1000L,
      "small" -> 250L))
    // α=0: uniform target → every source downsamples to ~|smallest|
    val eq = counts(0.0)
    assert(eq("small") == 250L, "smallest source binds and keeps all")
    for (g <- Seq("big", "mid"))
      assert(math.abs(eq(g) - 250L) < 60, s"$g ${eq(g)}")
    // α=0.5: between — big shrinks but stays above mid, tail keeps all
    val half = counts(0.5)
    assert(half("small") == 250L)
    assert(half("big") > half("mid") && half("big") < 4000L,
      half.toString)
  }

  test("mixCorpusTemperature drops null sources without distorting weights") {
    // null-source rows drop (the mixCorpus absent-source rule) — and
    // they must not enter the temperature weights: a large null block
    // would otherwise shift the feasible scale for every real source
    val withNulls = ((1L to 400L).map(i => (i, Some("big"))) ++
      (401L to 500L).map(i => (i, Some("small"))) ++
      (501L to 900L).map(i => (i, Option.empty[String])))
      .toDF("id", "grp")
    val out = Sampling.mixCorpusTemperature(withNulls, "grp", "id", 1.0)
      .groupBy("grp").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // α=1 on the non-null sources is the identity mix; no null rows out
    assert(out == Map(Some("big") -> 400L, Some("small") -> 100L),
      out.toString)
  }

  test("sampleToBudget greedily fills the budget in hash order") {
    val rows = (1L to 400L).map(i => (i, 10L + (i % 7))).toDF("id", "cost")
    val kept = Sampling.sampleToBudget(rows, "id", "cost", budget = 1000L,
      portable = true).select("id", "cost").as[(Long, Long)].collect()
    // local reference: same md5-prefix order, same greedy rule
    def key(i: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$i".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 12)
    }
    val expected = (1L to 400L).map(i => (i, 10L + (i % 7)))
      .sortBy(t => key(t._1))
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (i, c)) => (i, c, cum + c) }
      .tail.takeWhile(_._3 <= 1000L).map(t => (t._1, t._2)).toSet
    assert(kept.toSet == expected, s"${kept.length} vs ${expected.size}")
    assert(kept.map(_._2).sum <= 1000L)
    // budget 0 → empty; huge budget → everything
    assert(Sampling.sampleToBudget(rows, "id", "cost", 0L).count() == 0)
    assert(Sampling.sampleToBudget(rows, "id", "cost", Long.MaxValue)
      .count() == 400)
    // layout-invariant
    val again = Sampling.sampleToBudget(rows.repartition(17), "id", "cost",
      budget = 1000L, portable = true)
      .select("id").as[Long].collect().toSet
    assert(again == expected.map(_._1))
  }

  test("row fate is independent of the rest of the corpus (append-stable)") {
    // the sample drawn from a grown corpus agrees with the original
    // sample on every original row — the property rand() sampling lacks
    val small = Sampling.hashSample(base, "id", 0.15)
      .select("id").as[Long].collect().toSet
    val grown = base.union((900001L to 905000L)
      .map(i => (i, "new")).toDF("id", "grp"))
    val big = Sampling.hashSample(grown, "id", 0.15)
      .select("id").as[Long].collect().toSet
    assert(big.filter(_ <= 5000L) == small)
  }

  test("boundary fractions: 1.0 keeps everything, 0.0 keeps nothing") {
    for (portable <- Seq(true, false)) {
      assert(Sampling.hashSample(base, "id", 1.0, portable = portable)
        .count() == 5000, s"portable=$portable full")
      assert(Sampling.hashSample(base, "id", 0.0, portable = portable)
        .count() == 0, s"portable=$portable empty")
    }
  }

  test("different seeds draw different samples") {
    // in BOTH modes — portable mode mixes the seed into the md5 input
    // (md5(seed || ':' || id)), so requesting two seeds can never
    // silently return the same sample twice
    for (portable <- Seq(false, true)) {
      val a = Sampling.hashSample(base, "id", 0.2, seed = 1L,
          portable = portable)
        .select("id").as[Long].collect().toSet
      val b = Sampling.hashSample(base, "id", 0.2, seed = 2L,
          portable = portable)
        .select("id").as[Long].collect().toSet
      assert(a != b, s"portable=$portable seeds drew identical samples")
    }
  }

  test("stratifiedTake returns exactly min(n, |stratum|) per stratum") {
    val out = Sampling.stratifiedTake(base, "grp", "id", 50)
    val counts = out.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(counts.size == 7 && counts.values.forall(_ == 50L))
    // tiny stratum: fewer rows than n → all kept
    val tiny = base.filter($"id" <= 3)
    val outTiny = Sampling.stratifiedTake(tiny, "grp", "id", 50)
    assert(outTiny.count() == 3)
    // deterministic
    val again = Sampling.stratifiedTake(base, "grp", "id", 50)
    assert(out.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
  }

  test("capPerGroup selects the same rows as stratifiedTake, both modes") {
    // the window-free TopKAgg path must reproduce the window's
    // selection exactly — (hash key asc, id asc) is the same total
    // order in both operators
    for (portable <- Seq(false, true)) {
      val win = Sampling.stratifiedTake(base, "grp", "id", 50,
          portable = portable)
        .select("grp", "id").as[(String, Long)].collect().toSet
      val agg = Sampling.capPerGroup(base, "grp", "id", 50,
          portable = portable)
        .select("grp", "id").as[(String, Long)].collect().toSet
      assert(agg == win, s"portable=$portable: " +
        s"diff ${(agg diff win) ++ (win diff agg)}")
    }
    // layout invariance: map-side heaps merge to the same survivors
    val spread = Sampling.capPerGroup(base.repartition(13), "grp", "id",
      50).select("id").as[Long].collect().toSet
    val one = Sampling.capPerGroup(base.coalesce(1), "grp", "id", 50)
      .select("id").as[Long].collect().toSet
    assert(spread == one)
    // documented divergence: null strata drop (the window form would
    // sample them as one more partition)
    val withNull = base.union(Seq((90001L, null: String)).toDF("id", "grp"))
    assert(Sampling.capPerGroup(withNull, "grp", "id", 50)
      .filter($"grp".isNull).count() == 0)
  }

  test("cluster-safe split: no near-dup cluster ever spans two splits") {
    // the c02 composition on a corpus of planted copy-chains: doc i,
    // i+10000 and i+20000 are near-identical, so each triple must land
    // in ONE split — the structural guarantee that makes a test set
    // uncontaminated by near-dups of training rows
    val docs = (0L until 200L).map { i =>
      val body = s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i " +
        s"eta$i theta$i iota$i kappa$i"
      Seq((i, s"head $body"), (i + 10000L, body),
        (i + 20000L, s"$body tail"))
    }.flatten.toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashNearDupsPortable(docs, "text",
      "doc_id", shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
    val labels = graft.ops.Dedup.connectedComponents(
      pairs.select($"id_a", $"id_b"))
    val grouped = docs.select("doc_id")
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("grp", coalesce($"component", $"doc_id"))
    val split = Sampling.assignSplit(grouped, "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), portable = true)
    // every group maps to exactly one split (true by construction —
    // the split is a function of grp — but this is the contract)
    assert(split.groupBy($"grp")
      .agg(countDistinct($"split").as("ns"))
      .filter($"ns" > 1).count() == 0)
    // the planted triples actually clustered: their three members share
    // a group, so they share a split
    val triples = split.withColumn("fam", $"doc_id" % 10000L)
      .groupBy($"fam")
      .agg(countDistinct($"split").as("ns"), count(lit(1)).as("n"))
    assert(triples.filter($"n" === 3 && $"ns" =!= 1).count() == 0,
      "a copy-family leaked across splits")
    // and the assignment is the same one assignSplit gives the group key
    // directly (composition adds no hash drift)
    val direct = Sampling.assignSplit(grouped.select($"grp").distinct(),
      "grp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      portable = true)
    val joined = split.select($"grp", $"split").distinct()
      .join(direct.withColumnRenamed("split", "direct"), "grp")
    assert(joined.filter($"split" =!= $"direct").count() == 0)
  }

  test("temporalSplit: exact rank boundary, embargo band, tie handling") {
    // 10 rows at t = 100..1000 step 100, with a duplicate at 800.
    // N = 11, 80% rank = ceil(11*4/5) = 9 → threshold is the 9th value
    // ascending = 800. embargo 150: train t <= 650 → {100..600} (6),
    // embargo (650, 800] → {700, 800, 800} (3), test > 800 → {900,
    // 1000} (2).
    val ts = (1 to 10).map(_ * 100L) :+ 800L
    val df = ts.map(Tuple1(_)).toDF("t")
    val got = Sampling.temporalSplit(df, "t", pctNum = 4, pctDen = 5,
        embargoMicros = 150L)
      .groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("train" -> 6L, "embargo" -> 3L, "test" -> 2L))
    // zero embargo: the boundary row itself trains, strictly-later test
    val noEmb = Sampling.temporalSplit(df, "t", pctNum = 4, pctDen = 5)
      .groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(noEmb === Map("train" -> 9L, "test" -> 2L))
    // degenerate 100%: everything trains
    val all = Sampling.temporalSplit(df, "t", pctNum = 1, pctDen = 1)
      .groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(all === Map("train" -> 11L))
  }
}
