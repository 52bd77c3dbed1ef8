package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time velocity features — the transaction-burst
  * signal (`ops/Velocity`'s trailing-window count) computed AT SERVING
  * TIME inside the stream, per event, instead of in a nightly batch
  * window. This is the feature the reference's one-message-at-a-time
  * scorer (`FD/consumer.py:114`) fundamentally cannot see and a fraud
  * model most wants at inference: "how many events did THIS entity
  * produce in the trailing hour, as of THIS event".
  *
  * Shape: events group by entity through `flatMapGroupsWithState`;
  * state per entity = the event times still inside the trailing window
  * — bounded by per-entity rate × window span (the same bound as the
  * batch RANGE frame's in-memory state), NEVER corpus size. Each event
  * emits exactly once with its as-of count.
  *
  * State lifecycle: per-ENTITY state is bounded by rate × span, but
  * the state STORE holds one entry per entity ever seen (NoTimeout
  * keeps bounded-source semantics exact for the oracle gate).
  * Production runs on unbounded entity churn bound the total with the
  * state-store TTL knobs or an event-time timeout past the watermark —
  * the same stance as [[StreamDedup]]'s bucket vocabulary.
  *
  * Determinism contract (the StreamDedup stance): within a micro-batch
  * rows process in event-time order, and same-instant events are
  * admitted TOGETHER before any of them emits — the RANGE-frame peer
  * rule, so each tie sees all its peers, exactly like the batch
  * oracle. Across batches, events must arrive in nondecreasing
  * event-time order per entity (a per-key-ordered log — the Kafka
  * partition-per-key shape); a late event gets the count as-of its
  * arrival knowledge and earlier emissions are never retracted. Ties
  * that SPAN a batch boundary therefore under-count the earlier batch's
  * side by design; stage boundaries on range-partitioned time (or rely
  * on a single batch) for exact batch equivalence.
  *
  * VIOLATION VISIBILITY (r9 verdict mandate #6): the ordered-arrival
  * assumption is now detected, not just documented. Every state
  * carries the per-key event-time HIGH-WATER MARK across batches; a
  * row arriving with ts strictly below it is an out-of-order arrival
  * (the st19 late-audit shape applied to the state family), counted in
  * the `ooo` column every emission carries. The documented
  * as-of-arrival semantics still apply to the values — nothing is
  * retracted or reordered — but a production monitor alarming on
  * `ooo > 0` sees a violated assumption instead of silently-shifted
  * numbers. Within one batch the event-time sort makes order moot, so
  * only cross-batch regressions count — exactly the assumption's
  * scope.
  */
object StreamVelocity {

  case class TaggedEvent(user: Long, ts: Long, tag: String)
  case class VelRow(user: Long, ts: Long, tag: String, velN: Int,
                    ooo: Long)
  case class VelState(times: Seq[Long], hwm: Long, ooo: Long)

  case class EwmaEvent(user: Long, ts: Long, id: Long, v: Double)
  case class EwmaRow(user: Long, n: Long, ewma: Double, ooo: Long)
  case class EwmaState(n: Long, ewma: Double, hwm: Long, ooo: Long)

  /** Out-of-order arrivals in this batch: rows with event time
    * strictly below the key's cross-batch high-water mark. `sorted`
    * is the batch's event-time-ascending array, so one binary-search-
    * style scan of the prefix suffices — but the array is small and a
    * simple count is clearer.
    */
  private def countOoo(tss: Array[Long], hwm: Long): Long =
    tss.count(_ < hwm).toLong

  /** Streaming per-entity EWMA baseline — `ops/Velocity.ewmaFinal`
    * maintained IN the stream: state per entity is TWO numbers (count
    * + current average), the minimal adaptive baseline a serving-time
    * anomaly rule reads. Each micro-batch folds its rows in event-time
    * order (ties by id — the batch op's total order) continuing from
    * the carried state, so the arithmetic sequence is IDENTICAL to the
    * batch fold and the final state is bit-equal (the dyadic-α
    * contract; same cross-batch ordered-arrival stance as
    * [[trailingCounts]]). One row per entity per batch carries the
    * post-batch state; the LAST emission per entity (max n) is the
    * final answer.
    */
  def ewmaStates(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, valueCol: String,
                 aNum: Int = 1, aDen: Int = 8): Dataset[EwmaRow] = {
    require(aNum > 0 && aDen > 0 && aNum < aDen && (aDen & (aDen - 1)) == 0,
      s"alpha must be dyadic in (0,1): got $aNum/$aDen")
    val alpha = aNum.toDouble / aDen
    val beta = 1.0 - alpha
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[EwmaEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EwmaEvent],
         state: GroupState[EwmaState]) =>
          val sorted = rows.toArray.sortBy(r => (r.ts, r.id))
          val s0 = state.getOption.getOrElse(
            EwmaState(0L, 0.0, Long.MinValue, 0L))
          var (n, e) = (s0.n, s0.ewma)
          val ooo = s0.ooo + countOoo(sorted.map(_.ts), s0.hwm)
          val hwm =
            if (sorted.isEmpty) s0.hwm
            else math.max(s0.hwm, sorted.last.ts)
          var i = 0
          while (i < sorted.length) {
            e = if (n == 0L) sorted(i).v else e * beta + alpha * sorted(i).v
            n += 1
            i += 1
          }
          state.update(EwmaState(n, e, hwm, ooo))
          if (sorted.nonEmpty) Iterator(EwmaRow(user, n, e, ooo))
          else Iterator.empty
      }
  }

  case class CusumEvent(user: Long, ts: Long, id: Long, cents: Long)
  case class CusumRow(user: Long, n: Long, alarms: Long,
                      sp: Long, sn: Long, ooo: Long)
  case class CusumState(n: Long, sp: Long, sn: Long, al: Long,
                        hwm: Long, ooo: Long)

  /** Streaming two-sided CUSUM — `ops/Velocity.cusumFinal` maintained
    * IN the stream: regime-shift alarms AT SERVING TIME with four
    * integers of state per entity. All-integer cents arithmetic (the
    * batch op's contract), so each micro-batch continues the exact
    * fold and the last emission per entity equals the batch fold —
    * not approximately, identically. Same cross-batch ordered-arrival
    * stance as [[trailingCounts]].
    */
  def cusumStates(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  targetCents: Long, hCents: Long): Dataset[CusumRow] = {
    require(hCents > 0, "alarm threshold must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .as[CusumEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[CusumEvent],
         state: GroupState[CusumState]) =>
          val sorted = rows.toArray.sortBy(r => (r.ts, r.id))
          var st = state.getOption.getOrElse(
            CusumState(0L, 0L, 0L, 0L, Long.MinValue, 0L))
          val ooo = st.ooo + countOoo(sorted.map(_.ts), st.hwm)
          val hwm =
            if (sorted.isEmpty) st.hwm
            else math.max(st.hwm, sorted.last.ts)
          var i = 0
          while (i < sorted.length) {
            val d = sorted(i).cents - targetCents
            val sp1 = math.max(0L, st.sp + d)
            val sn1 = math.max(0L, st.sn - d)
            st =
              if (sp1 > hCents || sn1 > hCents)
                CusumState(st.n + 1, 0L, 0L, st.al + 1, hwm, ooo)
              else CusumState(st.n + 1, sp1, sn1, st.al, hwm, ooo)
            i += 1
          }
          state.update(st.copy(hwm = hwm, ooo = ooo))
          if (sorted.nonEmpty)
            Iterator(CusumRow(user, st.n, st.al, st.sp, st.sn, ooo))
          else Iterator.empty
      }
  }

  /** Per-event trailing-window count (including the event itself and
    * its same-instant peers) over `(t − windowMicros, t]` — the same
    * inclusive bound as the batch `RANGE windowMicros−1 PRECEDING`
    * frame. `tagCol` rides along for downstream grouping.
    */
  def trailingCounts(events: DataFrame, userCol: String, tsCol: String,
                     tagCol: String, windowMicros: Long): Dataset[VelRow] = {
    require(windowMicros > 0, "windowMicros must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    // dead-letter stance, enforced: a null user/ts would throw inside
    // the primitive-field encoder ("Null value appeared in non-nullable
    // field") and KILL the streaming query — rows without an entity or
    // a clock have no defined trailing count, so they drop here; a null
    // tag is representable and coalesces to "" for the sort tie-break
    events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("long").as("ts"),
        coalesce(col(tagCol).cast("string"), lit("")).as("tag"))
      .as[TaggedEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState[VelState, VelRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TaggedEvent],
         state: GroupState[VelState]) =>
          val s0 = state.getOption.getOrElse(
            VelState(Vector.empty[Long], Long.MinValue, 0L))
          var times = s0.times.toVector
          // batch rows carry no arrival order — event-time order is the
          // deterministic processing order (tag tie-break for stability)
          val sorted = rows.toArray.sortBy(r => (r.ts, r.tag))
          val ooo = s0.ooo + countOoo(sorted.map(_.ts), s0.hwm)
          val hwm =
            if (sorted.isEmpty) s0.hwm
            else math.max(s0.hwm, sorted.last.ts)
          val out = Vector.newBuilder[VelRow]
          var i = 0
          while (i < sorted.length) {
            val t = sorted(i).ts
            var j = i
            while (j < sorted.length && sorted(j).ts == t) j += 1
            // evict beyond the window, admit ALL same-instant peers,
            // then emit each with the full peer-inclusive count
            times = times.filter(_ > t - windowMicros) ++
              Vector.fill(j - i)(t)
            val n = times.length
            var k = i
            while (k < j) {
              out += VelRow(user, sorted(k).ts, sorted(k).tag, n, ooo)
              k += 1
            }
            i = j
          }
          state.update(VelState(times, hwm, ooo))
          out.result().iterator
      }
  }
}
