package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TransactionGen
import graft.ops.LogGrammar

/** Source/sink-shaped coverage — SURVEY §2.1 S3 (synthetic generator)
  * and S6/S7 (log-block format + parse round trip).
  */
object SourceQueries extends QuerySet {
  import Parity._

  private val enStop = graft.ops.TextAnalysis.langStopwords("en")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3/S4/F7/F8/F17: deterministic generator. Not DuckDB-expressible
    // (Spark's rand stream) — no oracle entry; the driver records a
    // rows-only check, and GenSpec asserts the invariants.
    "s03_generator" -> ((s, _) =>
      TransactionGen.batch(s, 10000, seed = 42)
        .groupBy(col("Is_Fraud"))
        .agg(count(lit(1)).as("n"),
          avg(col("Transaction_Amount")).as("avg_amount"),
          countDistinct(col("Transaction_Location")).as("n_locations"))
        .orderBy(col("Is_Fraud"))),

    // S3 portable twin: the same generator semantics — id-parity
    // alternation, the two amount bands, the 30% LOC99 + 03:00:05
    // injection — with every uniform draw md5-derived, so the oracle
    // rebuilds every row from the id alone and hash-checks the result.
    // s03 (the JVM rand(seed) form, the scale path) stays rows-only.
    "s03b_generator_portable" -> ((s, _) =>
      TransactionGen.batchPortable(s, 10000)
        .groupBy(col("Is_Fraud"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("Transaction_Amount") * 100).cast("long"))
            .as("cents_sum"),
          sum((col("Transaction_Location") === "LOC99").cast("long"))
            .as("n_loc99"),
          sum((col("Transaction_Time") === "03:00:05").cast("long"))
            .as("n_suspicious"),
          countDistinct(col("Transaction_Location")).as("n_locations"))
        .orderBy(col("Is_Fraud"))),

    // S2/A1/§2.6: a real Structured Streaming query — file source over
    // the events table, all-time counters in complete mode to a memory
    // sink — checked against the batch oracle (streaming ≡ batch on a
    // bounded source).
    "st01_stream_counters" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st01_counters_sink"
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn).orderBy(col("event_type"))
    }),

    // Event-time tumbling windows + watermark over the events stream
    // (beyond the reference surface — §2.6 notes the reference has no
    // windows; this is the standard Spark-native windowed counter).
    // Complete mode on a bounded source ≡ the batch per-hour rollup.
    "st02_stream_window" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st02_window_sink"
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("t",
          timestamp_micros(Tables.tsMicros(schema("ts").dataType)))
        .withWatermark("t", "10 minutes")
      val q = src
        .groupBy(window(col("t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn)
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("event_type"), col("cnt"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // Stream-static enrichment join (§2.6, beyond the reference): the
    // events stream joins the static customer dimension per micro-batch
    // (broadcast-able static side — no stream state), then aggregates
    // per segment. Complete mode on a bounded source ≡ the batch join.
    "st03_stream_static_join" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val cust = s.read.parquet(s"$d/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
      val qn = "st03_join_sink"
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ck", col("user_id") % 1000 + 1)
        .join(cust, col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("uid_sum"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn).orderBy(col("c_mktsegment"))
    }),

    // Streaming deduplication: the stream unions with itself (every
    // event delivered twice — the at-least-once replay shape), then
    // dropDuplicates on the event key restores exactly-once counts.
    // The oracle is the batch distinct. The watermark-bounded variant
    // (dropDuplicatesWithinWatermark, bounded state) is spec'd in
    // StreamSpec; complete-mode-with-agg here keeps the sink
    // oracle-comparable.
    "st04_stream_dedup" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st04_dedup_sink"
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val q = src.union(src)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn).orderBy(col("event_type"))
    }),

    // Streaming MinHash-LSH dedup (§2.6 × the dedup layer): documents
    // stream in (replayed twice — the at-least-once shape — plus a
    // planted first-word-dropped near-copy of every 4th doc), band
    // keys compute scan-locally in portable md5 mode, and each
    // (band, bucket) claims its first-seen document via
    // flatMapGroupsWithState. A doc survives iff it wins every band.
    // On a bounded source ids arrive in one ordered batch, so the kept
    // set equals the batch rule the oracle states: keep d iff d is the
    // min id in all of its buckets.
    "st05_stream_lsh_dedup" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val qn = "st05_dedup_sink"
      // doc_id bound = the d02b convention: the portable md5 signature
      // is the interpreted parity kernel, so the verify/bench corpus is
      // bounded (no-op at sf0.01; at sf0.1 it caps the md5 volume) —
      // the XXH64 production mode has no bound
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .select(col("doc_id"), col("text"))
        // CAP: baseline cover=d02_minhash_lsh
        .filter(col("doc_id") < 1000)
      def withPlanted = src.union(src.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
      val verdicts = graft.streaming.StreamDedup.bandVerdicts(
        withPlanted.union(withPlanted), "text", "doc_id",
        shingleSize = 3, numHashes = 8, bands = 4, portable = true)
      val q = verdicts.toDF.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.StreamDedup.keptIds(s.table(qn))
        .agg(count(lit(1)).as("n_kept"),
          sum(when(col("id") >= 1000000, 1L).otherwise(0L))
            .as("n_copies_kept"),
          sum(col("id")).cast("long").as("id_checksum"))
    }),

    // Streaming quality gate (§2.6 × the text layer): the full Gopher
    // rule battery — pure integer-comparison column exprs — runs
    // INSIDE the stream's scan, aggregating per-language pass counts
    // in complete mode. The filter a streaming crawl ingest applies
    // before anything is persisted; bounded source ≡ the batch battery.
    "st06_stream_quality" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val qn = "st06_quality_sink"
      val g = graft.ops.TextAnalysis.gopherRules(col("text"),
        graft.ops.TextAnalysis.langStopwords("en"), minWords = 30)
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .select(col("lang"), g.as("g"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("g.pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(!col("g.stopword_ok"), 1L).otherwise(0L)).as("f_stop"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn).orderBy(col("lang"))
    }),

    // Stream-stream join (§2.6): click→purchase attribution — each
    // click joins purchases by the SAME user landing within 10 minutes
    // after it. Both sides carry watermarks and the join condition
    // bounds event time, so Spark can evict state (the only way a
    // stream-stream join survives unbounded input). Inner join in
    // append mode on a bounded source ≡ the batch interval join the
    // oracle states; times run on epoch-µs (j09's NANOS convention).
    "st07_stream_stream_join" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st07_join_sink"
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val tsUs = Tables.tsMicros(schema("ts").dataType)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          timestamp_micros(tsUs).as("ct"))
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          timestamp_micros(tsUs).as("pt"))
      // a stream-stream join commits FOUR state stores per shuffle
      // partition per micro-batch; partition count is pinned at query
      // start, so size it to the state volume (arrival rate × horizon),
      // not the batch-analytics default — 32 partitions here means 128
      // store commits per batch for kilobytes of state. On a real
      // cluster this knob scales with executor count; sizing it
      // deliberately is the point. Round-9 A/B at sf0.1 (canary-
      // controlled, BENCHNOTES_r9): 8→4→2 partitions took st07
      // 3.58→3.32→2.58 s and st08 7.71→6.10→5.00 s — the store-commit
      // floor halves with the partition count while results are
      // partition-independent (all 20 st oracles re-verified green).
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = graft.streaming.Attribution.intervalJoin(
            clicks, purchases, keyCol = "user_id",
            leftTimeCol = "ct", rightTimeCol = "pt",
            horizon = "10 minutes", watermark = "30 minutes")
          .select(col("click_id"), col("purchase_id"),
            (unix_micros(col("pt")) - unix_micros(col("ct"))).as("gap_us"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(expr("gap_us div 60000000").as("gap_min"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("click_id")).cast("long").as("click_checksum"),
          sum(col("purchase_id")).cast("long").as("purchase_checksum"))
        .orderBy(col("gap_min"))
    }),

    // Left-outer stream-stream join (§2.6): clicks that never
    // converted. Unmatched clicks emit with null purchase columns only
    // once the watermark passes click-time + horizon, so far-future
    // sentinel events (user −1, excluded from the result) are appended
    // on EACH side to close every real click's window. Eviction runs
    // with the watermark of the PREVIOUS batch, so the sentinels land
    // in two rounds: round 1 drags the watermark past the corpus,
    // round 2 is the data batch whose eviction applies it — relying on
    // the trailing no-data cleanup batch instead is a race on a file
    // source. Bounded source + closed watermark ≡ the batch left
    // interval join the oracle states.
    "st08_stream_outer_join" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st08_in")
      // staged as epoch-µs BIGINT so the stream side is physical-type
      // independent (Tables.tsMicros absorbs the testdata's clock type)
      val ev = Tables.eventsMicros(s, d)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"))
      // bounded driver scalar: one max over the corpus
      val maxTs = ev.agg(max(col("ts_us"))).head().getLong(0)
      val hourUs = 3600L * 1000000L
      def sentinels(round: Long) = s.range(1).select(
          lit(-2 * round).as("event_id"),
          lit(maxTs + round * hourUs).as("ts_us"),
          lit(-1L).as("user_id"), lit("click").as("event_type"))
        .union(s.range(1).select(
          lit(-2 * round - 1).as("event_id"),
          lit(maxTs + round * hourUs - 1L).as("ts_us"),
          lit(-1L).as("user_id"), lit("purchase").as("event_type")))
        .coalesce(1)
      // few large staged files: each file-source batch pays the full
      // stateful-join overhead, so 32 shuffle-partition files would
      // mean 32 micro-batches of state-store round-trips
      ev.coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st08_outer_sink"
      def src = s.readStream.schema(schema).parquet(stage)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          timestamp_micros(col("ts_us")).as("ct"))
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          timestamp_micros(col("ts_us")).as("pt"))
      // state-partition sizing: see st07 — the outer join pays the
      // four-store commit cost on EVERY one of its three micro-batches
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = graft.streaming.Attribution.intervalJoin(
            clicks, purchases, keyCol = "user_id",
            leftTimeCol = "ct", rightTimeCol = "pt",
            horizon = "10 minutes", watermark = "30 minutes",
            joinType = "left_outer")
          // sentinels flow through to the sink and are excluded in the
          // batch aggregation below — a pushable in-stream predicate
          // like user_id != -1 would be pushed into BOTH scans (the left
          // directly, the right via the join-key equality constraint)
          // and silently drop the rows that drive the watermark
          .select(col("click_id"), col("purchase_id"),
            (unix_micros(col("pt")) - unix_micros(col("ct"))).as("gap_us"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try {
          for (round <- 1L to 2L) {
            sentinels(round).write.mode("append").parquet(stage)
            q.processAllAvailable()
          }
        } finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .filter(col("click_id") >= 0L)
        .groupBy(coalesce(expr("gap_us div 60000000"), lit(-1L))
          .cast("long").as("gap_min"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("click_id")).cast("long").as("click_checksum"),
          sum(col("purchase_id")).cast("long").as("purchase_checksum"))
        .orderBy(col("gap_min"))
    }),

    // Watermark LATE-DATA audit (§2.6): the odd-user half of the
    // stream arrives one micro-batch AFTER the even-user half, so
    // every odd-user event older than (max even-user event time −
    // 10 min) targets an already-finalized 1-hour window and is
    // DROPPED by the watermark; append mode additionally withholds
    // windows the final watermark has not passed. The oracle replays
    // BOTH rules in SQL (ms-floored watermark arithmetic, ≤ window
    // end) — the exact accounting a deployment needs to trust its
    // streaming counts.
    "st19_stream_late_audit" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st19_in")
      val ev = Tables.eventsMicros(s, d)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
        .select(col("ts_us"), col("user_id"))
      def stageOne(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit =
        Tables.stageOne(stage, df, name, mtime)
      // mtimes force batch order. Three batches, because window state
      // is only EVICTED at the end of a batch that runs with the
      // advanced watermark: b0 (even users) advances it, b1 (the odd
      // users' final hour — fresh rows) triggers the eviction sweep,
      // b2 (the odd backlog) then hits finalized windows and drops.
      // The hour boundary below is replayed by the oracle from the
      // same MAX(even ts) aggregate.
      val base = System.currentTimeMillis()
      val even = ev.filter(col("user_id") % 2 === 0)
      val odd = ev.filter(col("user_id") % 2 === 1)
      val thrUs = even.agg(max(col("ts_us"))).first().getLong(0) /
        3600000000L * 3600000000L
      stageOne(even, "b0", base - 180000)
      stageOne(odd.filter(col("ts_us") >= thrUs), "b1", base - 120000)
      stageOne(odd.filter(col("ts_us") < thrUs), "b2", base - 60000)
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st19_late_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .withColumn("t", timestamp_micros(col("ts_us")))
          .withWatermark("t", "10 minutes")
          .groupBy(window(col("t"), "1 hour"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("user_id")).as("uid_sum"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("cnt"), col("uid_sum").cast("long").as("uid_sum"))
        .orderBy(col("ws"))
    }),

    // Streaming session windows (§2.6 × w03): the same 30-minute-gap
    // session aggregation, but built INCREMENTALLY — events arrive in
    // four separate micro-batches (maxFilesPerTrigger=1 over a 4-file
    // stage, arbitrary row order), so sessions split across batches
    // must merge in the session-window state store. Complete mode on
    // the bounded source must converge to the batch gaps-and-islands
    // answer regardless of arrival order — the property that makes
    // sessionization on a live stream trustworthy.
    "st09_stream_session" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st09_in")
      Tables.eventsMicros(s, d)
        .select(col("ts_us"), col("user_id"))
        .coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st09_session_sink"
      // state-partition sizing: see st07
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .withColumn("t", timestamp_micros(col("ts_us")))
          .withWatermark("t", "10 minutes")
          .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn).agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).cast("long").as("n_events"),
        max(col("n")).as("max_events"),
        countDistinct(col("user_id")).as("n_users"))
    }),

    // Streaming point-in-time velocity (§2.6 × w09): per-event
    // trailing-1h counts computed IN the stream via per-entity state
    // (streaming/StreamVelocity) — the burst feature at serving time.
    // Single-batch bounded source + in-group event-time ordering ≡ the
    // batch RANGE-frame oracle; cross-batch incrementality and tie
    // semantics are StreamSpec-gated with controlled MemoryStream
    // batches.
    // Streaming EWMA baseline (§2.6 × w11): the per-entity adaptive
    // average maintained in the stream — state is TWO numbers per
    // entity, each batch continues the bit-exact dyadic-α fold, and
    // the last emission per entity must equal the batch w11 fold
    // exactly (same oracle SQL).
    // Streaming conformal serving (§2.6 × m18): the calibration
    // quantile is computed OFFLINE from the batch table (the artifact
    // a deployment ships next to the model coefficients), then the
    // stream scores each arriving row and stamps its prediction-set
    // flags via a stateless stream-static broadcast join — the audit
    // over the sink must equal the batch m18 row identically (same
    // oracle SQL).
    "st18_stream_conformal" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/lineitem.parquet").schema
      val qn = "st18_conformal_sink"
      val model = Seq("x_qty" -> 0.08, "x_disc" -> -12.0, "x_tax" -> 6.5)
      def feats(df: org.apache.spark.sql.DataFrame) = df.select(
        col("l_orderkey"),
        (col("l_returnflag") === "R").cast("int").as("label"),
        col("l_quantity").cast("double").as("x_qty"),
        col("l_discount").cast("double").as("x_disc"),
        col("l_tax").cast("double").as("x_tax"))
      val stats = graft.ops.Conformal.calibrationStats(
        graft.ml.Models.scoreLogistic(
          feats(s.read.parquet(s"$d/lineitem.parquet")), model,
          intercept = -2.0),
        "label", "proba", "l_orderkey")
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "lineitem.parquet").parquet(d)
      val flags = graft.ops.Conformal.servingFlags(
        graft.ml.Models.scoreLogistic(feats(src), model,
          intercept = -2.0),
        stats, "label", "proba", "l_orderkey")
        .select(col("__ncal"), col("__k"), col("__q7"), col("__sy"),
          col("__c1"), col("__c0"))
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = flags.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      graft.ops.Conformal.auditAgg(s.table(qn))
    }),

    "st14_stream_ewma" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st14_ewma_sink"
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts_us", Tables.tsMicros(schema("ts").dataType))
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = graft.streaming.StreamVelocity.ewmaStates(
            src, "user_id", "ts_us", "event_id", "value")
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("user").as("user_id"))
        .agg(max(col("n")).as("n_events"),
          max_by(col("ewma"), col("n")).as("ewma"))
        .orderBy(col("user_id"))
    }),

    // Streaming CUSUM changepoint alarms (§2.6 × w14): four integers
    // of state per entity, each batch continues the exact all-cents
    // fold, and the last emission per entity must equal the batch w14
    // result identically (same oracle SQL).
    "st15_stream_cusum" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st15_cusum_sink"
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts_us", Tables.tsMicros(schema("ts").dataType))
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = graft.streaming.StreamVelocity.cusumStates(
            src, "user_id", "ts_us", "event_id", "value",
            targetCents = 5000L, hCents = 20000L)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("user").as("user_id"))
        .agg(max(col("n")).as("n_events"),
          max_by(col("alarms"), col("n")).as("alarms"),
          max_by(col("sp"), col("n")).as("sp_cents"),
          max_by(col("sn"), col("n")).as("sn_cents"))
        .orderBy(col("user_id"))
    }),

    "st10_stream_velocity" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st10_velocity_sink"
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts_us", Tables.tsMicros(schema("ts").dataType))
      // state-partition sizing: see st07
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = graft.streaming.StreamVelocity.trailingCounts(
            src, "user_id", "ts_us", "event_type",
            windowMicros = 3600L * 1000000L)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("tag").as("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("velN")).cast("long").as("max_vel"),
          sum(when(col("velN") >= 3, 1L).otherwise(0L)).as("n_burst"),
          sum(col("velN")).as("sum_vel"))
        .orderBy(col("event_type"))
    }),

    // §2.6 bounded-lateness reorder (r10 verdict mandate #1): the
    // velocity state ABSORBING out-of-order arrival instead of merely
    // detecting it. The corpus re-stages into three mtime-ordered
    // files by JITTERED event time (deterministic ±15 min xxhash64 of
    // event_id), so consecutive micro-batches genuinely interleave
    // inside a 30-minute band — the Kafka multi-partition shape — and
    // a per-user punctuation file (null event_type, ts past max+L)
    // drains the buffers. With maxLateness = 30 min every arrival is
    // within the contract, so the released fold is the event-time-
    // ordered one: the batch RANGE-window oracle matches EXACTLY and
    // the ooo counter the output carries must be zero.
    "st23_stream_velocity_reorder" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st23_in")
      val lateUs = 1800000000L // 30 min
      val jit = lateUs / 2
      val ev = Tables.eventsMicros(s, d)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_type"),
          (col("ts_us") + pmod(xxhash64(col("event_id")),
            lit(2 * jit + 1)) - jit).as("__pt"))
      val stats = ev.agg(min(col("__pt")), max(col("__pt")),
        max(col("ts_us"))).first()
      val (mnPt, mxPt, mxTs) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      val span = (mxPt - mnPt) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          ev.filter(col("__pt") >= mnPt + i * span &&
              col("__pt") < mnPt + (i + 1) * span)
            .select(col("user_id"), col("ts_us"), col("event_type")),
          s"b$i", base - 240000 + i * 60000)
      }
      Tables.stageOne(stage,
        ev.select(col("user_id")).distinct()
          .withColumn("ts_us", lit(mxTs + lateUs + 1))
          .withColumn("event_type", lit(null).cast("string")),
        "b3", base - 60000)
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st23_reorder_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamVelocity.trailingCounts(
            src, "user_id", "ts_us", "event_type",
            windowMicros = 3600L * 1000000L, maxLateness = lateUs)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("tag").as("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("velN")).cast("long").as("max_vel"),
          sum(when(col("velN") >= 3, 1L).otherwise(0L)).as("n_burst"),
          sum(col("velN")).as("sum_vel"),
          max(col("ooo")).as("ooo_max"))
        .orderBy(col("event_type"))
    }),

    // Streaming quantiles on an UNKNOWN value domain (§2.6 × a49, the
    // r10 mandate-#7 gap st13's fixed-domain histogram left): the KLL
    // sketch maintained as streaming aggregation state — the
    // TypedImperativeAggregate buffer serializes into the state store
    // between micro-batches (four mtime-ordered files), constant
    // per-group state regardless of stream length. Complete mode's
    // final tick must satisfy the same exact-quantile + within-bound
    // gate as the batch a49 (same oracle SQL) — merge order across
    // batches differs from batch execution, which is exactly what the
    // worst-case bound absorbs.
    "st25_stream_kll" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st25_in")
      val raw = Tables.events(s, d)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"),
          col("value").cast("double").as("v"))
      raw.coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st25_kll_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .groupBy(col("grp"))
          .agg(graft.functions.KllSketchAgg.kllQuantiles(
            col("v"), 512, Seq(10, 25, 50, 75, 90, 99)).as("q"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      MetricsQueries.kllGate(s.table(qn), raw, capacity = 512)
    }),

    // §2.6 × a49, through the STATE STORE (r11 verdict mandate #7):
    // the KLL sketch as per-entity flatMapGroupsWithState state — the
    // Append-mode per-entity quantile monitor on an unknown domain
    // (st13's histogram needed the domain up front; st25 held the
    // sketch in a complete-mode aggregation buffer). Four mtime-
    // ordered micro-batches serialize the compactor hierarchy through
    // the store between every pair; the final tick must satisfy the
    // same exact-quantile + within-bound gate as batch a49 — the
    // worst-case bound is merge-order-free, so the restore boundary
    // sits inside it. Same oracle as a49/st25.
    "st30_stream_kll_state" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st30_in")
      val raw = Tables.events(s, d)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"),
          col("value").cast("double").as("v"))
      raw.coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st30_kll_state_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamVelocity.kllQuantileStates(
            src, "grp", "v", capacity = 512,
            percents = Seq(10, 25, 50, 75, 90, 99))
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      val finalTick = s.table(qn).groupBy(col("grp"))
        .agg(max_by(col("q"), col("n")).as("q"))
      MetricsQueries.kllGate(finalTick, raw, capacity = 512)
    }),

    // §2.6 × a50, through the STATE STORE (the st30 pattern applied
    // to frequency): the Misra–Gries summary as per-entity
    // flatMapGroupsWithState state — the Append-mode per-entity
    // top-items monitor (st26 held the summary in a complete-mode
    // aggregation buffer). The retained SET depends on arrival order,
    // but the gate only pins the theorem facts (every true heavy
    // hitter retained, estimate within n/(k+1)) — deterministic
    // booleans under ANY order, the a50/st26 stance. Same oracle.
    "st31_stream_hh_state" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st31_in")
      val raw = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"),
          expr("CASE WHEN user_id % 2 = 0 THEN user_id % 10 " +
            "ELSE user_id END").as("item"))
      raw.coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st31_hh_state_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamSketch.hhStates(
            src, "grp", "item", k = 64)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      val finalTick = s.table(qn).groupBy(col("grp"))
        .agg(max_by(col("hh"), col("n")).as("hh"))
      MetricsQueries.hhGate(finalTick, raw, k = 64)
    }),

    // §2.6 × t29: streaming concat-and-chunk packing — the per-shard
    // token offset as ONE LONG of state, documents binned at arrival
    // across three id-ordered micro-batches; the last emission per
    // shard equals the batch prefix-sum stats exactly (same oracle).
    "st32_stream_chunk_pack" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st32_in")
      val toks = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("doc_id").isNotNull &&
          length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("ntok"))
      val stats = toks.agg(min(col("doc_id")), max(col("doc_id"))).first()
      val (mnId, mxId) = (stats.getLong(0), stats.getLong(1))
      val span = (mxId - mnId) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          toks.filter(col("doc_id") >= mnId + i * span &&
            col("doc_id") < mnId + (i + 1) * span),
          s"b$i", base - 240000 + i * 60000)
      }
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st32_pack_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamPack.chunkPackStates(
            src, "doc_id", "ntok", capacity = 512L, nShards = 8)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("shard"))
        .agg(max(col("nDocs")).as("n_docs"),
          max_by(col("nTokens"), col("nDocs")).as("n_tokens"),
          max_by(col("nBins"), col("nDocs")).as("n_bins"),
          max_by(col("nStraddling"), col("nDocs")).as("n_straddling"))
        .orderBy(col("shard"))
    }),

    // §2.6 × t30: streaming document-boundary next-fit packing — the
    // OPEN BIN (two longs) as per-shard state, so a bin straddles
    // micro-batch boundaries exactly as the batch fold's cells carry;
    // three id-ordered batches, last emission per shard equals the
    // batch two-cell fold (same oracle as t30).
    "st33_stream_nextfit_pack" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st33_in")
      val toks = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("doc_id").isNotNull &&
          length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("ntok"))
      val stats = toks.agg(min(col("doc_id")), max(col("doc_id"))).first()
      val (mnId, mxId) = (stats.getLong(0), stats.getLong(1))
      val span = (mxId - mnId) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          toks.filter(col("doc_id") >= mnId + i * span &&
            col("doc_id") < mnId + (i + 1) * span),
          s"b$i", base - 240000 + i * 60000)
      }
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st33_nf_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamPack.nextFitStates(
            src, "doc_id", "ntok", capacity = 512L, nShards = 8)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("shard"))
        .agg(max(col("nDocs")).as("n_docs"),
          max_by(col("nTokens"), col("nDocs")).as("n_tokens"),
          max_by(col("nBins"), col("nDocs")).as("n_bins"),
          max_by(col("lastFill"), col("nDocs")).as("last_fill"),
          max_by(col("nOversize"), col("nDocs")).as("n_oversize"),
          max_by(col("effPpm"), col("nDocs")).as("eff_ppm"))
        .orderBy(col("shard"))
    }),

    // Streaming heavy hitters at k counters of state (§2.6 × a50):
    // the Misra–Gries summary maintained as streaming aggregation
    // state across four micro-batches — constant per-group state on
    // an unbounded stream, and because the merge rule is the
    // mergeable-summaries one, the worst-case retention/bound
    // guarantee survives the stream's merge tree. Same oracle as the
    // batch a50.
    "st26_stream_heavy_hitters" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st26_in")
      val raw = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"),
          expr("CASE WHEN user_id % 2 = 0 THEN user_id % 10 " +
            "ELSE user_id END").as("item"))
      raw.coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st26_hh_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .groupBy(col("grp"))
          .agg(graft.functions.HeavyHittersAgg.heavyHitters(
            col("item"), 64).as("hh"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      MetricsQueries.hhGate(s.table(qn), raw, k = 64)
    }),

    // §2.6 streaming AMS F₂ (a51's batch sketch as streaming state):
    // a LINEAR sketch, so the stream's incremental fold across
    // micro-batches is bit-equal to the batch counters — the strongest
    // of the three mergeable-sketch stories (st25 bound-preserving
    // rank, st26 bound-preserving frequency, st27 LOSSLESS moment).
    // Same oracle as batch a51.
    "st27_stream_ams_f2" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st27_in")
      val raw = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"), col("user_id").as("item"))
      raw.coalesce(4).write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val qn = "st27_ams_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .groupBy(col("grp"))
          .agg(graft.functions.AmsSketchAgg.amsSketch(
            col("item"), 64).as("z"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      MetricsQueries.amsGate(s.table(qn), raw, r = 64)
    }),

    // §2.6 streaming Holt (w21's level+trend fold as streaming state):
    // the daily cent series staged as three DAY-ORDERED micro-batches,
    // three integers of state per type folding across them — the last
    // emission per type must equal the batch w21 fold bit for bit
    // (same integer algebra, same oracle).
    "st28_stream_holt" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st28_in")
      val daily = Tables.eventsMicros(s, d)
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("CAST(ts_us AS BIGINT) div 86400000000").as("day"))
        .agg(sum(round(col("value") * 100).cast("bigint")).as("cents"))
      val stats = daily.agg(min(col("day")), max(col("day"))).first()
      val (mnD, mxD) = (stats.getLong(0), stats.getLong(1))
      val span = (mxD - mnD) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          daily.filter(col("day") >= mnD + i * span &&
            col("day") < mnD + (i + 1) * span),
          s"b$i", base - 240000 + i * 60000)
      }
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st28_holt_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamVelocity.holtStates(
            src, "event_type", "day", "cents")
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("grp").as("event_type"))
        .agg(max(col("n")).as("n_days"),
          max_by(col("l"), col("n")).as("level_fp"),
          max_by(col("b"), col("n")).as("trend_fp"))
        .withColumn("forecast7_fp",
          col("level_fp") + lit(7L) * col("trend_fp"))
        .orderBy(col("event_type"))
    }),

    // §2.6 streaming Holt–Winters (w22's triple fold as streaming
    // state): the daily cent series staged as three DAY-ORDERED
    // micro-batches, p + 2 integers of state per type (level, trend,
    // seasonal ring) folding across them — the last emission per type
    // must equal the batch w22 fold bit for bit (same integer
    // algebra, same oracle).
    "st29_stream_holt_winters" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st29_in")
      val daily = Tables.eventsMicros(s, d)
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("CAST(ts_us AS BIGINT) div 86400000000").as("day"))
        .agg(sum(round(col("value") * 100).cast("bigint")).as("cents"))
      val stats = daily.agg(min(col("day")), max(col("day"))).first()
      val (mnD, mxD) = (stats.getLong(0), stats.getLong(1))
      val span = (mxD - mnD) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          daily.filter(col("day") >= mnD + i * span &&
            col("day") < mnD + (i + 1) * span),
          s"b$i", base - 240000 + i * 60000)
      }
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st29_hw_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamVelocity.hwStates(
            src, "event_type", "day", "cents")
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("grp").as("event_type"))
        .agg(max(col("n")).as("n_days"),
          max_by(col("l"), col("n")).as("level_fp"),
          max_by(col("b"), col("n")).as("trend_fp"),
          max_by(col("sNext"), col("n")).as("s_next_fp"),
          max_by(col("sLast"), col("n")).as("__s_last"))
        .withColumn("forecast1_fp",
          col("level_fp") + col("trend_fp") + col("s_next_fp"))
        .withColumn("forecast7_fp",
          col("level_fp") + lit(7L) * col("trend_fp") + col("__s_last"))
        .drop("__s_last")
        .orderBy(col("event_type"))
    }),

    // §2.6 reorder × EWMA (same staging recipe as st23): the
    // bit-exact dyadic fold must survive a shuffled batch schedule —
    // the last emission per user equals the batch fold IDENTICALLY,
    // gated by the same list_reduce oracle as st14, with the ooo
    // counter pinned to zero.
    "st24_stream_ewma_reorder" -> ((s, d) => {
      val stage = Tables.stageDir(s, "st24_in")
      val lateUs = 1800000000L
      val jit = lateUs / 2
      val ev = Tables.eventsMicros(s, d)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull &&
          col("event_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("value"),
          (col("ts_us") + pmod(xxhash64(col("event_id")),
            lit(2 * jit + 1)) - jit).as("__pt"))
      val stats = ev.agg(min(col("__pt")), max(col("__pt")),
        max(col("ts_us"))).first()
      val (mnPt, mxPt, mxTs) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      val span = (mxPt - mnPt) / 3 + 1
      val base = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        Tables.stageOne(stage,
          ev.filter(col("__pt") >= mnPt + i * span &&
              col("__pt") < mnPt + (i + 1) * span)
            .select(col("user_id"), col("ts_us"), col("event_id"),
              col("value")),
          s"b$i", base - 240000 + i * 60000)
      }
      Tables.stageOne(stage,
        ev.select(col("user_id")).distinct()
          .withColumn("ts_us", lit(mxTs + lateUs + 1))
          .withColumn("event_id", lit(-1L))
          .withColumn("value",
            lit(null).cast(ev.schema("value").dataType)),
        "b3", base - 60000)
      val schema = s.read.parquet(s"$stage/b0.parquet").schema
      val qn = "st24_reorder_sink"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", Tables.streamParts)
      try {
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
        val q = graft.streaming.StreamVelocity.ewmaStates(
            src, "user_id", "ts_us", "event_id", "value",
            maxLateness = lateUs)
          .toDF.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(qn)
        .groupBy(col("user").as("user_id"))
        .agg(max(col("n")).as("n_events"),
          max_by(col("ewma"), col("n")).as("ewma"),
          max(col("ooo")).as("ooo_max"))
        .orderBy(col("user_id"))
    }),

    // Streaming cardinality at constant state (§2.6 × a20b): the
    // portable-HLL register frame maintained IN the stream — state is
    // 16 (reg → max rank) rows no matter how many events flow, the
    // whole point of sketched distinct-counting on an unbounded
    // stream (exact streaming distinct = unbounded state). Register
    // update is a plain streaming max aggregate (mergeable, complete
    // mode); the estimate collapse runs batch-side on the 16-row
    // table. The DuckDB oracle replays registers AND estimate
    // bit-exactly (a20b's integer-arithmetic recipe).
    "st11_stream_distinct" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st11_distinct_sink"
      val (reg, rank) = graft.ops.Aggregates.hllRegRank("user_id")
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .filter(col("user_id").isNotNull)
        .select(reg.as("reg"), rank.as("rk"))
        .groupBy(col("reg")).agg(max(col("rk")).as("r"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      graft.ops.Aggregates.hllEstimateFromRegisters(s.table(qn))
    }),

    // Streaming heavy hitters at constant state (§2.6 × a20c): the
    // count-min cell table maintained IN the stream — state is
    // depth·width (= 1024) counter rows no matter how many events
    // flow, where exact per-key streaming counts would grow with the
    // key domain. The cell update is a plain grouped count (mergeable,
    // complete mode); the top-k probe finish runs batch-side against
    // the streamed cells. The oracle is the a20c recipe verbatim —
    // streamed cells must equal batch cells bit-exactly.
    "st12_stream_heavy_hitters" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st12_cms_sink"
      val q = graft.ops.Aggregates.cmsCells(
        s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d),
        "user_id")
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      graft.ops.Aggregates.cmsProbeTopK(s.table(qn),
        Tables.events(s, d), "user_id")
    }),

    // Streaming A/B significance: the 2×2 (variant, conv) cell counts
    // as complete-mode state — FOUR rows forever, the smallest state
    // in the st family after st01 — collapsed batch-side through the
    // same abTestFromCounts χ² spelling a32 uses, so streamed counts
    // ≡ batch bit-for-bit under a32's oracle.
    "st21_stream_ab_test" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st21_ab_sink"
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .filter(col("user_id").isNotNull)
        .select((col("user_id") % 2).cast("int").as("variant"),
          (col("event_type") === "purchase").cast("int").as("conv"))
        .groupBy(col("variant"), col("conv"))
        .agg(count(lit(1)).as("cnt"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val cells = s.table(qn)
      graft.ops.Aggregates.abTestFromCounts(cells.agg(
        sum(when(col("variant") === 0 && col("conv") === 0, col("cnt"))
          .otherwise(0L)).as("a0n"),
        sum(when(col("variant") === 0 && col("conv") === 1, col("cnt"))
          .otherwise(0L)).as("a0y"),
        sum(when(col("variant") === 1 && col("conv") === 0, col("cnt"))
          .otherwise(0L)).as("a1n"),
        sum(when(col("variant") === 1 && col("conv") === 1, col("cnt"))
          .otherwise(0L)).as("a1y")))
    }),

    // Streaming Gini (§2.6 × a48): the (type, cents) count histogram
    // maintained IN the stream — state bounded by the VALUE DOMAIN
    // (distinct cents per type, the st20-threshold-histogram contract
    // class), never by event count — with the factored Lorenz finish
    // (giniFromHist) batch-side. Spend-concentration drift is the
    // wash-trading monitor a dashboard polls; the oracle is a48's
    // recipe verbatim, so streamed counts must equal batch bit-exactly.
    "st22_stream_gini" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st22_gini_sink"
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_type").as("__g"),
          round(col("value") * 100).cast("bigint").as("__v"))
        .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      graft.ops.Aggregates.giniFromHist(s.table(qn))
        .orderBy(col("grp"))
    }),

    // Streaming Benford screen (§2.6 × a29): the (type, digit)
    // observed-count table maintained IN the stream — state is ≤ 9
    // rows per event type forever — with the expected/χ² collapse
    // batch-side; the oracle is a29's recipe verbatim, so streamed
    // counts must equal batch counts bit-exactly.
    "st16_stream_benford" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st16_benford_sink"
      val cents = round(col("value") * 100).cast("long")
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        // rounded-cents gate (a29 discipline): (0, 0.005) rounds to 0
        // cents whose digit 0 would blow up the expected-share table
        .filter(col("value").isNotNull && cents >= 1)
        .select(col("event_type").as("grp"),
          substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("grp"), col("digit")).agg(count(lit(1)).as("obs"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val counts = s.table(qn)
      val tot = counts.groupBy(col("grp").as("gt"))
        .agg(sum(col("obs")).as("n"))
      counts.join(broadcast(tot), col("grp") === col("gt"))
        .withColumn("expected",
          col("n").cast("double")
            * (log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
              / log(lit(10.0))))
        .select(col("grp"), col("digit"), col("obs"),
          round(col("expected"), 6).as("expected"),
          round((col("obs").cast("double") - col("expected"))
            * (col("obs").cast("double") - col("expected"))
            / col("expected"), 6).as("chi2_part"))
        .orderBy(col("grp"), col("digit"))
    }),

    // Streaming quantiles at constant state (§2.6 × a26): an
    // equal-width histogram of the value column maintained IN the
    // stream — state is ≤ 64 buckets per event type regardless of
    // event count (exact streaming quantiles = unbounded state; the
    // histogram is the classic bounded answer). The p50/p90/p99
    // collapse runs batch-side on the sketch via the integer
    // first-rank rule; DuckDB replays histogram AND rule bit-exactly.
    "st13_stream_histogram" -> ((s, d) => {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val qn = "st13_hist_sink"
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .filter(col("value").isNotNull)
        .select(col("event_type").as("grp"),
          least(greatest(floor(col("value") / 25).cast("int"), lit(0)),
            lit(63)).as("bucket"))
        .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("c"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      graft.ops.Aggregates.histogramQuantiles(s.table(qn), Seq(50, 90, 99))
        .orderBy(col("grp"), col("q"))
    }),

    // ORC round-trip: write the orders subset as ORC (Spark's second
    // built-in columnar format — its own predicate-pushdown and
    // encoding path), read it back, aggregate. The oracle states the
    // same aggregate over the original parquet — identical rows prove
    // the format round-trips values exactly.
    // Parquet bloom-filter layout: point-lookup ids are exactly what
    // min-max row-group stats CANNOT prune (high-cardinality values
    // span every group's range), so the write plants a bloom filter on
    // o_custkey — LayoutSpec proves the filter is physically in the
    // footer; this oracle proves values survive the rewrite exactly
    // under point probes.
    "s12_bloom_scan" -> ((s, d) => {
      val path = Tables.stageDir(s, "s12_bloom")
      graft.ops.Layout.writeBloomFiltered(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice")),
        path, "o_custkey", ndv = 20000L)
      s.read.parquet(path)
        .filter(col("o_custkey").isin(7L, 77L, 777L))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("key_sum"),
          dsum(col("o_totalprice")).as("price_sum"))
        .orderBy(col("o_custkey"))
    }),

    // Schema evolution across parquet generations (the 100-TB drift
    // reality: a column added mid-corpus): generation 1 lacks
    // o_orderstatus, generation 2 carries it; a mergeSchema read must
    // unify the files, null-fill the missing column for gen-1 rows,
    // and keep every value exact. The oracle restates the same
    // generation split directly over orders.
    "s11_schema_evolution" -> ((s, d) => {
      val path = Tables.stageDir(s, "s11_evo")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.filter(col("o_orderkey") % 2 === 0)
        .drop("o_orderstatus")
        .write.mode("overwrite").parquet(s"$path/gen=1")
      base.filter(col("o_orderkey") % 2 === 1)
        .write.mode("overwrite").parquet(s"$path/gen=2")
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("gen"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("key_sum"),
          dsum(col("o_totalprice")).as("price_sum"))
        .orderBy(col("gen"), col("o_orderstatus"))
    }),

    // CSV round-trip (S5 under the oracle, completing the s07/s08
    // format family): orders staged as headered CSV, read back with
    // the EXPLICIT schema (the S5 contract — no inference pass), same
    // aggregate as s07. Doubles survive the text round-trip bit-exactly
    // (Spark prints shortest-roundtrip representations); dates travel
    // as ISO strings.
    "s15_csv_roundtrip" -> ((s, d) => {
      val path = Tables.stageDir(s, "s15_csv")
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderstatus"))
      src.write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema(src.schema).option("header", "true").csv(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // JSON-lines round-trip (the interchange format every ingestion
    // edge speaks): orders staged as GZIP JSONL — the compressed form
    // production JSONL actually ships (and splits per-FILE, not
    // per-block: many gz files = the parallelism unit) — read back
    // with the EXPLICIT schema (no inference pass — same contract as
    // s15), same aggregate as the rest of the format family. Doubles
    // survive (Spark emits shortest-roundtrip literals); dates travel
    // as ISO strings that the date-typed schema parses back.
    // Compression added per r10 verdict mandate #4: the uncompressed
    // stage was 10 GB at the 50× probe and its page-cache crossing,
    // not the parse, drove e(10→50)=1.47.
    "s16_json_roundtrip" -> ((s, d) => {
      val path = Tables.stageDir(s, "s16_json")
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderstatus"))
      src.write.mode("overwrite").option("compression", "gzip").json(path)
      s.read.schema(src.schema).json(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    "s07_orc_roundtrip" -> ((s, d) => {
      val path = Tables.stageDir(s, "s07_orc")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderstatus"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // Partition-directory round-trip (the corpus storage layout): docs
    // written hive-partitioned by lang, read back with a partition
    // predicate — the predicate prunes directories at LISTING time
    // (gated in LayoutSpec), so a one-language read never touches the
    // other shards. Values must survive the partition-column encode/
    // decode (lang travels as a directory name, not parquet data).
    "s09_partitioned_scan" -> ((s, d) => {
      val path = Tables.stageDir(s, "s09_part")
      graft.ops.Layout.writePartitioned(
        Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        path, Seq("lang"))
      s.read.parquet(path)
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast("long").as("id_sum"),
          sum(col("n_chars")).cast("long").as("char_sum"))
        .orderBy(col("lang"))
    }),

    // Z-order-clustered layout: orders rewritten so each file covers a
    // small RECTANGLE of (custkey, totalprice) space, then read back
    // with a 2-D range predicate — the layout that lets BOTH filter
    // columns prune files/row groups via parquet min-max, where a
    // single-column range layout only serves one of them (file-skipping
    // gated in LayoutSpec). Values must survive the rewrite exactly.
    "s10_zorder_scan" -> ((s, d) => {
      val path = Tables.stageDir(s, "s10_zorder")
      graft.ops.Layout.writeZOrdered(
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus")),
        path, "o_custkey", "o_totalprice")
      s.read.parquet(path)
        .filter(col("o_custkey").between(20, 120) &&
          col("o_totalprice").between(50000, 150000))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).cast("long").as("key_sum"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Bucketed co-located join: both fact tables rewritten bucketed
    // on the order key, then joined — the layout that makes the 100-TB
    // fact-to-fact join exchange-free (each side's scan already carries
    // the hash partitioning; PlanSpec pins zero Exchange on the join).
    // Values must survive the bucketed rewrite exactly: the oracle is
    // the same join over the RAW tables.
    "s13_bucketed_join" -> ((s, d) => {
      // Stage the bucketed tables ONCE per session+sfDir: the query
      // exists to prove the exchange-free co-located join (PlanSpec
      // pins zero Exchange), so a bench rep should measure the JOIN,
      // not re-run the layout rewrite it already did — a real bucketed
      // table is written once and queried forever. The stamp conf keys
      // the staging to the sfDir so a session that switches datasets
      // restages instead of serving stale buckets.
      val stampKey = "spark.graft.s13.stagedFor"
      val staged = s.conf.getOption(stampKey).contains(d) &&
        s.catalog.tableExists("graft_s13_orders") &&
        s.catalog.tableExists("graft_s13_lineitem")
      if (!staged) {
        graft.ops.Layout.writeBucketed(
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice")),
          "graft_s13_orders", "o_orderkey", 16,
          Some(Tables.stageDir(s, "s13_orders")))
        graft.ops.Layout.writeBucketed(
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_quantity"),
              col("l_extendedprice")),
          "graft_s13_lineitem", "l_orderkey", 16,
          Some(Tables.stageDir(s, "s13_lineitem")))
        s.conf.set(stampKey, d)
      }
      s.table("graft_s13_orders")
        .join(s.table("graft_s13_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") % 10).as("cust_band"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("cust_band"))
    }),

    // Small-file compaction plan over the documents inventory: greedy
    // in-id-order packing into ~4000-byte bins per source, one prefix-
    // sum window per group (metadata-sized input, never a global sort).
    // Output is the per-bin manifest a rewrite job would execute.
    "s14_compaction_plan" -> ((s, d) =>
      graft.ops.Layout.compactionPlan(
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars")),
        "source", "doc_id", "n_chars", targetBytes = 4000L)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("n_chars")).cast("long").as("bytes"),
          min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
        .orderBy(col("source"), col("bin"))),

    // JSON-lines round-trip: the wire format of the reference's Kafka
    // messages (S1/S2) as a file source/sink — write, read with an
    // explicit schema (inference is the reference's bug surface, not
    // ours), aggregate.
    "s08_json_roundtrip" -> ((s, d) => {
      val path = Tables.stageDir(s, "s08_json")
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      src.write.mode("overwrite").json(path)
      s.read.schema(src.schema).json(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_custkey")).as("cust_sum"))
        .orderBy(col("o_orderstatus"))
    }),

    // S6+S7+F10-F14: render each order as a consumer-log block, parse the
    // block back with the map-based grammar, and aggregate the recovered
    // typed fields. The oracle states the round-trip identity directly.
    "s06_log_grammar" -> ((s, d) => {
      // fan the narrow order rows across cores before the block kernel
      val o = graft.ops.Layout.fanOut(Tables.orders(s, d))
      val block = LogGrammar.formatBlock(
        txnId = concat(lit("TXN"), col("o_orderkey")),
        custId = concat(lit("CUST"), col("o_custkey")),
        amount = round(col("o_totalprice"), 2),
        typ = col("o_orderpriority"),
        merchant = concat(lit("MERC"), col("o_custkey") % 1000),
        location = concat(lit("LOC"), col("o_custkey") % 50),
        device = concat(lit("DEV"), col("o_orderkey") % 900),
        date = date_format(col("o_orderdate"), "yyyy-MM-dd"),
        time = lit("12:00:00"),
        prediction = (col("o_orderstatus") === "F").cast("int"),
        actual = (col("o_orderstatus") === "F").cast("int"),
        probability = (col("o_custkey") % 10000) / 10000.0)
      val parsed = o.select(block.as("block"))
        .select(LogGrammar.parseBlock(col("block")).as("m"))
      parsed.select(
        col("m").getItem("type").as("typ"),
        LogGrammar.amountOf(col("m")).as("amount"),
        LogGrammar.predictedOf(col("m")).as("pred"),
        LogGrammar.probabilityOf(col("m")).as("prob"))
        .groupBy(col("typ"))
        .agg(count(lit(1)).as("n"),
          dsum(col("amount")).as("sum_amount"),
          sum(col("pred")).as("n_fraud"),
          max(col("prob")).as("max_prob"))
        .orderBy(col("typ"))
    })
  )

  def oracle: Map[String, String] = Map(
    // replays the portable generator row-for-row: the same md5-hex
    // uniforms (first 8 hex chars of "s03_<k>:<id>" over 2^32 — hex
    // digits folded with integer shifts, so the u values are
    // bit-identical to Spark's conv(md5)), the same parity/band/
    // injection closed forms, and seconds-of-day arithmetic instead of
    // wall-clock formatting (timezone-proof).
    "s03b_generator_portable" ->
      """WITH ids AS (SELECT r.range AS id FROM range(0, 10000) r),
         hx AS (SELECT id,
                  substr(md5('s03_5:' || CAST(id AS VARCHAR)), 1, 8) AS h5,
                  substr(md5('s03_11:' || CAST(id AS VARCHAR)), 1, 8) AS h11,
                  substr(md5('s03_13:' || CAST(id AS VARCHAR)), 1, 8) AS h13
                FROM ids),
         ks AS (SELECT id,
                  SUM((strpos('0123456789abcdef', substr(h5, p.range + 1, 1)) - 1)
                      << (4 * (7 - p.range))) AS k5,
                  SUM((strpos('0123456789abcdef', substr(h11, p.range + 1, 1)) - 1)
                      << (4 * (7 - p.range))) AS k11,
                  SUM((strpos('0123456789abcdef', substr(h13, p.range + 1, 1)) - 1)
                      << (4 * (7 - p.range))) AS k13
                FROM hx CROSS JOIN range(0, 8) p GROUP BY id),
         base AS (SELECT id,
                  CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END AS is_fraud,
                  (id % 2 = 0 AND k13 / 4294967296.0 > 0.7) AS pattern,
                  CASE WHEN id % 2 = 0
                       THEN 500000 + CAST(FLOOR(k5 / 4294967296.0 * 500000) AS BIGINT)
                       ELSE 1000 + CAST(FLOOR(k5 / 4294967296.0 * 299000) AS BIGINT)
                  END AS cents,
                  (1735689600 + 2 * id) % 86400 AS sod,
                  CASE WHEN id % 2 = 0 AND k13 / 4294967296.0 > 0.7
                       THEN 'LOC99'
                       ELSE 'LOC' || CAST(1 + CAST(FLOOR(k11 / 4294967296.0 * 50) AS BIGINT) AS VARCHAR)
                  END AS loc
                FROM ks)
         SELECT CAST(is_fraud AS INT) AS Is_Fraud, COUNT(*) AS n,
                CAST(SUM(cents) AS BIGINT) AS cents_sum,
                CAST(SUM(CASE WHEN loc = 'LOC99' THEN 1 ELSE 0 END) AS BIGINT) AS n_loc99,
                CAST(SUM(CASE WHEN pattern OR sod = 10805 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspicious,
                COUNT(DISTINCT loc) AS n_locations
         FROM base GROUP BY 1 ORDER BY 1""",
    "st01_stream_counters" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
         GROUP BY event_type ORDER BY event_type""",
    "st04_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n,
                CAST(SUM(event_id) AS BIGINT) AS id_sum
         FROM events GROUP BY event_type ORDER BY event_type""",
    "st05_stream_lsh_dedup" ->
      """WITH base AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 1000
           UNION ALL
           SELECT doc_id + 1000000, substr(text, instr(text, ' ') + 1)
           FROM documents WHERE doc_id % 4 = 0 AND doc_id < 1000),
         t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
               FROM base),
         s AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) < 3
                   THEN [list_aggregate(toks, 'string_agg', ' ')]
                   ELSE list_transform(range(0, len(toks) - 2),
                          i -> list_aggregate(toks[i+1:i+3],
                                              'string_agg', ' '))
                 END) AS sh FROM t),
         sig AS (SELECT doc_id,
                   list_transform(range(0, 8), i ->
                     list_aggregate(list_transform(sh,
                       x -> md5(i::VARCHAR || ':' || x)), 'min')) AS sig
                 FROM s),
         bands AS (SELECT doc_id, b,
                     md5(list_aggregate(sig[b*2+1:b*2+2],
                                        'string_agg', ',')) AS bucket
                   FROM sig, (SELECT unnest(range(0, 4)) AS b)),
         wins AS (SELECT b, bucket, MIN(doc_id) AS w
                  FROM bands GROUP BY b, bucket),
         kept AS (SELECT x.doc_id AS id
                  FROM bands x
                  JOIN wins w ON w.b = x.b AND w.bucket = x.bucket
                  GROUP BY x.doc_id
                  HAVING MIN(CASE WHEN x.doc_id = w.w
                             THEN 1 ELSE 0 END) = 1)
         SELECT COUNT(*) AS n_kept,
                CAST(SUM(CASE WHEN id >= 1000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_copies_kept,
                CAST(SUM(id) AS BIGINT) AS id_checksum
         FROM kept""",
    "st06_stream_quality" ->
      s"""WITH t AS (SELECT lang, text,
                  string_split_regex(trim(text), '\\s+') AS toks,
                  string_split_regex(trim(lower(text)), '\\s+') AS ltoks
                FROM documents),
          m AS (SELECT lang,
                  CAST(len(toks) AS BIGINT) AS n,
                  CAST(COALESCE(list_aggregate(
                    list_transform(toks, x -> len(x)), 'sum'), 0)
                    AS BIGINT) AS sum_len,
                  CAST(len(list_filter(toks,
                    x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
                  CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                    AS BIGINT) AS n_sym,
                  CAST(len(list_filter(ltoks, x -> x IN
                    (${enStop.map(w => s"'$w'").mkString(",")})))
                    AS BIGINT) AS n_stop
                FROM t),
          r AS (SELECT lang,
                  (n >= 30 AND n <= 100000) AS words_ok,
                  (sum_len >= 3 * n AND sum_len <= 10 * n) AS mean_len_ok,
                  (10 * n_sym <= n) AS symbol_ok,
                  (5 * n_alpha >= 4 * n) AS alpha_ok,
                  (n_stop >= 2) AS stopword_ok
                FROM m)
          SELECT lang, COUNT(*) AS n,
            CAST(SUM(CASE WHEN words_ok AND mean_len_ok AND symbol_ok
                           AND alpha_ok AND stopword_ok
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
            CAST(SUM(CASE WHEN NOT stopword_ok THEN 1 ELSE 0 END)
                 AS BIGINT) AS f_stop
          FROM r GROUP BY lang ORDER BY lang""",
    "st07_stream_stream_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
                      epoch_us(ts) AS ct
                    FROM events WHERE event_type = 'click'),
           p AS (SELECT event_id AS purchase_id, user_id,
                   epoch_us(ts) AS pt
                 FROM events WHERE event_type = 'purchase'),
           j AS (SELECT click_id, purchase_id, pt - ct AS gap_us
                 FROM c JOIN p USING (user_id)
                 WHERE pt >= ct AND pt <= ct + 600000000)
         SELECT gap_us // 60000000 AS gap_min, COUNT(*) AS n_pairs,
                CAST(SUM(click_id) AS BIGINT) AS click_checksum,
                CAST(SUM(purchase_id) AS BIGINT) AS purchase_checksum
         FROM j GROUP BY 1 ORDER BY 1""",
    "st08_stream_outer_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
                      epoch_us(ts) AS ct
                    FROM events WHERE event_type = 'click'),
           p AS (SELECT event_id AS purchase_id, user_id,
                   epoch_us(ts) AS pt
                 FROM events WHERE event_type = 'purchase'),
           j AS (SELECT c.click_id, p.purchase_id, p.pt - c.ct AS gap_us
                 FROM c LEFT JOIN p
                   ON c.user_id = p.user_id
                  AND p.pt >= c.ct AND p.pt <= c.ct + 600000000)
         SELECT CAST(COALESCE(gap_us // 60000000, -1) AS BIGINT)
                  AS gap_min,
                COUNT(*) AS n_rows,
                CAST(SUM(click_id) AS BIGINT) AS click_checksum,
                CAST(SUM(purchase_id) AS BIGINT) AS purchase_checksum
         FROM j GROUP BY 1 ORDER BY 1""",
    "s15_csv_roundtrip" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
            ${sqlSum("o_totalprice")} AS sum_price,
            MIN(o_orderdate) AS min_date,
            MAX(o_orderkey) AS max_key
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s07_orc_roundtrip" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
            ${sqlSum("o_totalprice")} AS sum_price,
            MIN(o_orderdate) AS min_date,
            MAX(o_orderkey) AS max_key
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s16_json_roundtrip" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
            ${sqlSum("o_totalprice")} AS sum_price,
            MIN(o_orderdate) AS min_date,
            MAX(o_orderkey) AS max_key
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // watermark replay: thr = the hour containing the last even-user
    // event (the b0/b1/b2 staging boundary); wm2 = watermark in force
    // when the odd backlog arrives (max of batches 0-1, ms-floored,
    // minus the 10-min delay); wmf = final watermark that gates which
    // windows append mode has emitted. A backlog row survives only if
    // its window was not yet finalized (window end > wm2).
    "st19_stream_late_audit" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, user_id AS u
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         thr AS (SELECT (MAX(t) // 3600000000) * 3600000000 AS h
                 FROM e WHERE u % 2 = 0),
         wm2 AS (SELECT (GREATEST(
                    MAX(CASE WHEN u % 2 = 0 THEN t END),
                    MAX(CASE WHEN u % 2 = 1
                              AND t >= (SELECT h FROM thr) THEN t END))
                   // 1000) - 600000 AS w
                 FROM e),
         wmf AS (SELECT (MAX(t) // 1000) - 600000 AS w FROM e),
         kept AS (SELECT t, u FROM e, thr, wm2
                  WHERE u % 2 = 0 OR t >= thr.h
                     OR NOT (((t // 3600000000) + 1) * 3600000
                             <= wm2.w)),
         agg AS (SELECT (t // 3600000000) * 3600 AS ws,
                   COUNT(*) AS cnt, CAST(SUM(u) AS BIGINT) AS uid_sum,
                   ((t // 3600000000) + 1) * 3600000 AS we
                 FROM kept GROUP BY 1, 4)
         SELECT ws, cnt, uid_sum
         FROM agg, wmf WHERE we <= wmf.w ORDER BY ws""",
    "s14_compaction_plan" ->
      """WITH f AS (SELECT source, doc_id, n_chars,
                      COALESCE(SUM(n_chars) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS pre
                    FROM documents)
         SELECT source, CAST(pre // 4000 AS BIGINT) AS bin,
                COUNT(*) AS n_files,
                CAST(SUM(n_chars) AS BIGINT) AS bytes,
                MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         FROM f GROUP BY source, bin ORDER BY source, bin""",
    "s13_bucketed_join" ->
      s"""SELECT o_custkey % 10 AS cust_band, COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS sum_qty,
                 ${sqlSum("l_extendedprice")} AS sum_price,
                 COUNT(DISTINCT o_orderkey) AS n_orders
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1 ORDER BY 1""",
    "s12_bloom_scan" ->
      s"""SELECT o_custkey, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                 ${sqlSum("o_totalprice")} AS price_sum
          FROM orders WHERE o_custkey IN (7, 77, 777)
          GROUP BY o_custkey ORDER BY o_custkey""",
    "s11_schema_evolution" ->
      s"""WITH g AS (
           SELECT 1 AS gen, o_orderkey, o_totalprice,
                  CAST(NULL AS VARCHAR) AS o_orderstatus
           FROM orders WHERE o_orderkey % 2 = 0
           UNION ALL
           SELECT 2, o_orderkey, o_totalprice, o_orderstatus
           FROM orders WHERE o_orderkey % 2 = 1)
         SELECT gen, o_orderstatus, COUNT(*) AS n,
                CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                ${sqlSum("o_totalprice")} AS price_sum
         FROM g GROUP BY gen, o_orderstatus
         ORDER BY gen, o_orderstatus""",
    "s09_partitioned_scan" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS char_sum
         FROM documents WHERE lang IN ('en', 'de')
         GROUP BY lang ORDER BY lang""",
    "s08_json_roundtrip" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
            ${sqlSum("o_totalprice")} AS sum_price,
            CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "s10_zorder_scan" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
            ${sqlSum("o_totalprice")} AS sum_price
          FROM orders
          WHERE o_custkey BETWEEN 20 AND 120
            AND o_totalprice BETWEEN 50000 AND 150000
          GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "st09_stream_session" ->
      """WITH d AS (
           SELECT user_id, epoch_us(ts) AS t,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
         s AS (
           SELECT user_id,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS sid
           FROM d),
         g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY user_id, sid)
         SELECT COUNT(*) AS n_sessions,
                CAST(SUM(n) AS BIGINT) AS n_events,
                CAST(MAX(n) AS BIGINT) AS max_events,
                COUNT(DISTINCT user_id) AS n_users
         FROM g""",
    "st14_stream_ewma" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_id IS NOT NULL AND value IS NOT NULL)
         SELECT user_id, COUNT(*) AS n_events,
                list_reduce(
                  list(value ORDER BY t, event_id),
                  (acc, x) -> acc * 0.875 + 0.125 * x) AS ewma
         FROM e GROUP BY user_id ORDER BY user_id""",
    // the sketch's streaming fold satisfies the same exact+bound gate
    "st25_stream_kll" -> MetricsQueries.kllOracleSql,
    "st30_stream_kll_state" -> MetricsQueries.kllOracleSql,
    "st31_stream_hh_state" -> MetricsQueries.hhOracleSql,
    "st32_stream_chunk_pack" -> TextQueries.chunkPackOracleSql,
    "st33_stream_nextfit_pack" -> TextQueries.nextFitOracleSql,
    "st26_stream_heavy_hitters" -> MetricsQueries.hhOracleSql,
    // the linear sketch's streaming fold is bit-equal to batch a51
    "st27_stream_ams_f2" -> MetricsQueries.amsOracleSql,
    // the integer Holt fold's last emission is bit-equal to batch w21
    "st28_stream_holt" -> WindowQueries.holtOracleSql,
    "st29_stream_holt_winters" -> WindowQueries.holtWintersOracleSql,
    // reorder arm: released fold ≡ event-time order, so the SAME
    // RANGE-window replay gates it — plus the pinned-zero ooo gate
    "st23_stream_velocity_reorder" ->
      """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS t
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_type IS NOT NULL),
         w AS (SELECT event_type, COUNT(*) OVER win AS vn
               FROM e
               WINDOW win AS (PARTITION BY user_id ORDER BY t
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW))
         SELECT event_type, COUNT(*) AS n,
                CAST(MAX(vn) AS BIGINT) AS max_vel,
                CAST(SUM(CASE WHEN vn >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_burst,
                CAST(SUM(vn) AS BIGINT) AS sum_vel,
                CAST(0 AS BIGINT) AS ooo_max
         FROM w GROUP BY event_type ORDER BY event_type""",
    "st24_stream_ewma_reorder" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_id IS NOT NULL AND value IS NOT NULL)
         SELECT user_id, COUNT(*) AS n_events,
                list_reduce(
                  list(value ORDER BY t, event_id),
                  (acc, x) -> acc * 0.875 + 0.125 * x) AS ewma,
                CAST(0 AS BIGINT) AS ooo_max
         FROM e GROUP BY user_id ORDER BY user_id""",
    "st10_stream_velocity" ->
      """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS t
                    FROM events),
         w AS (SELECT event_type, COUNT(*) OVER win AS vn
               FROM e
               WINDOW win AS (PARTITION BY user_id ORDER BY t
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW))
         SELECT event_type, COUNT(*) AS n,
                CAST(MAX(vn) AS BIGINT) AS max_vel,
                CAST(SUM(CASE WHEN vn >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_burst,
                CAST(SUM(vn) AS BIGINT) AS sum_vel
         FROM w GROUP BY event_type ORDER BY event_type""",
    "st02_stream_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
                event_type, COUNT(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",
    // the streaming CUSUM must converge to the BATCH fold exactly —
    // same oracle SQL as w14 by construction
    "st15_stream_cusum" -> WindowQueries.oracle("w14_cusum"),
    // streamed (type, cents) counts ≡ batch, so a48's replay IS the
    // st22 oracle (the st15/st16 convention)
    "st22_stream_gini" -> OpsQueries.oracle("a48_gini"),
    "st18_stream_conformal" -> MlQueries.oracle("m18_conformal"),
    // streamed Benford counts must equal the a29 batch recipe verbatim
    "st16_stream_benford" -> OpsQueries.oracle("a29_benford"),
    "st21_stream_ab_test" -> OpsQueries.oracle("a32_ab_test"),
    "st13_stream_histogram" ->
      """WITH h AS (SELECT event_type AS grp,
                      LEAST(GREATEST(CAST(floor(value / 25) AS INT), 0),
                            63) AS bucket,
                      COUNT(*) AS c
                    FROM events WHERE value IS NOT NULL
                    GROUP BY 1, 2),
         t AS (SELECT grp, SUM(c) AS n FROM h GROUP BY grp),
         cum AS (SELECT a.grp, a.bucket, SUM(b.c) AS cum
                 FROM h a JOIN h b
                   ON a.grp = b.grp AND b.bucket <= a.bucket
                 GROUP BY a.grp, a.bucket),
         j AS (SELECT cum.grp, cum.bucket, cum.cum, t.n
               FROM cum JOIN t ON cum.grp = t.grp),
         qs AS (SELECT unnest([50, 90, 99]) AS q)
         SELECT grp, q, MIN(bucket) AS bucket
         FROM j CROSS JOIN qs
         WHERE cum * 100 >= n * q
         GROUP BY grp, q ORDER BY grp, q""",
    "st12_stream_heavy_hitters" ->
      """WITH rws AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
                      WHERE user_id IS NOT NULL),
         cells AS (SELECT hrow,
                     (instr('0123456789abcdef', substr(h,1,1))-1)*16 +
                     (instr('0123456789abcdef', substr(h,2,1))-1) AS bucket,
                     COUNT(*) AS c
                   FROM (SELECT hrow,
                           md5(CAST(hrow AS VARCHAR) || ':' || k) AS h
                         FROM rws, (SELECT unnest(range(0,4)) AS hrow))
                   GROUP BY 1,2),
         top AS (SELECT k AS key, COUNT(*) AS n_exact FROM rws GROUP BY k
                 ORDER BY n_exact DESC, key ASC LIMIT 5),
         probes AS (SELECT key, n_exact, hrow,
                      (instr('0123456789abcdef', substr(h,1,1))-1)*16 +
                      (instr('0123456789abcdef', substr(h,2,1))-1) AS bucket
                    FROM (SELECT key, n_exact, hrow,
                            md5(CAST(hrow AS VARCHAR) || ':' || key) AS h
                          FROM top, (SELECT unnest(range(0,4)) AS hrow)))
         SELECT key, n_exact, MIN(c) AS n_cms
         FROM probes JOIN cells USING (hrow, bucket)
         GROUP BY key, n_exact
         ORDER BY n_exact DESC, key ASC""",
    "st11_stream_distinct" ->
      """WITH r AS (SELECT md5('hll:' || CAST(user_id AS VARCHAR)) AS h
                    FROM events WHERE user_id IS NOT NULL),
         hx AS (SELECT (instr('0123456789abcdef', substr(h,1,1)) - 1) AS reg,
                  list_aggregate(list_transform(range(12),
                    i -> (instr('0123456789abcdef', substr(h,(i+2)::INT,1))
                          - 1)::BIGINT << (4*(11-i))::INT), 'sum') AS v
                FROM r),
         rk AS (SELECT reg,
                  CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END AS rk
                FROM hx),
         regs AS (SELECT reg, MAX(rk) AS r FROM rk GROUP BY reg),
         hll AS (SELECT COUNT(*) AS nonzero,
                   SUM(1::BIGINT << (50 - r)::INT) AS sp FROM regs)
         SELECT nonzero AS hll_nonzero,
                CAST(sp + (16 - nonzero) * (1::BIGINT << 50) AS BIGINT)
                  AS hll_s,
                CAST(0.673 AS DOUBLE) * CAST(256 AS DOUBLE) *
                  CAST(1125899906842624 AS DOUBLE) /
                  CAST(sp + (16 - nonzero) * (1::BIGINT << 50) AS DOUBLE)
                  AS hll_raw_est
         FROM hll""",
    "st03_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
                CAST(SUM(user_id) AS BIGINT) AS uid_sum
         FROM events JOIN customer ON user_id % 1000 + 1 = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "s06_log_grammar" ->
      s"""SELECT o_orderpriority AS typ, COUNT(*) AS n,
           ${sqlSum("ROUND(o_totalprice, 2)")} AS sum_amount,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fraud,
           MAX((o_custkey % 10000) / 10000.0) AS max_prob
          FROM orders GROUP BY o_orderpriority ORDER BY typ"""
  )
}
