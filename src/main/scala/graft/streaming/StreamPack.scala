package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming concat-and-chunk packing — [[graft.ops.Packing.chunkPack]]
  * maintained IN the stream: the per-shard token OFFSET is the whole
  * state (one long plus three counters), so documents arriving over
  * time keep extending each shard's token stream and every document's
  * bin placement/straddle verdict is decided at arrival — the
  * ingestion-time form of training-batch construction, where the
  * batch op repacks the corpus nightly.
  *
  * Each micro-batch folds its documents in id order continuing from
  * the carried offset; cross-batch id order is the staging contract
  * (the [[StreamVelocity.holtStates]] stance), so the LAST emission
  * per shard carries exactly the batch op's per-shard stats (st32
  * shares t29's oracle). The contract is MONITORED, not assumed
  * (ADVICE r12, the velocity family's `ooo` stance): the state
  * carries the last folded id per shard, and a doc arriving in a
  * later batch with a smaller id — which is appended at the CURRENT
  * offset, where the batch op would have placed it earlier — counts
  * into `ooo`, so a violated staging contract is an observable
  * nonzero column instead of a silent batch/stream divergence.
  */
object StreamPack {

  case class PackEvent(shard: Long, id: Long, tok: Long)
  case class PackRow(shard: Long, nDocs: Long, nTokens: Long,
                     nBins: Long, nStraddling: Long, ooo: Long)
  case class PackState(nDocs: Long, off: Long, nStraddling: Long,
                       lastId: Long, ooo: Long)

  case class NfRow(shard: Long, nDocs: Long, nTokens: Long,
                   nBins: Long, lastFill: Long, nOversize: Long,
                   effPpm: Long, ooo: Long)
  case class NfState(nDocs: Long, nTokens: Long, bins: Long,
                     fill: Long, nOversize: Long, lastId: Long,
                     ooo: Long)

  /** Streaming document-boundary next-fit —
    * [[graft.ops.Packing.nextFitStats]] maintained IN the stream
    * (r12 verdict mandate #6, completing st32's family): the state
    * per shard is the OPEN BIN — two longs (bins opened, current
    * fill) plus counters — folded over id-ordered docs continuing
    * across micro-batches, so a bin can straddle a batch boundary: a
    * doc arriving next batch that would overflow the open bin closes
    * it exactly as the batch fold would have. LAST emission per
    * shard equals the batch op's stats (st33 shares t30's oracle);
    * same monitored cross-batch id contract (`ooo`) as
    * [[chunkPackStates]], same loud eff_ppm overflow stance as the
    * batch op (JVM-side here).
    */
  def nextFitStates(docs: DataFrame, idCol: String, tokensCol: String,
                    capacity: Long, nShards: Int): Dataset[NfRow] = {
    require(capacity >= 1L, s"capacity must be >= 1, got $capacity")
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards in [1, 2^20], got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(idCol).isNotNull && col(tokensCol).isNotNull &&
        col(tokensCol) >= 1L)
      .select(pmod(col(idCol).cast("long"), lit(nShards.toLong))
          .as("shard"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("tok"))
      .as[PackEvent]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[NfState, NfRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[PackEvent],
         state: GroupState[NfState]) =>
          val sorted = rows.toArray.sortBy(_.id)
          val s0 = state.getOption.getOrElse(
            NfState(0L, 0L, 0L, 0L, 0L, Long.MinValue, 0L))
          var (nd, nt, bins, fill) = (s0.nDocs, s0.nTokens, s0.bins,
            s0.fill)
          var nOver = s0.nOversize
          val ooo = s0.ooo + sorted.count(_.id <= s0.lastId).toLong
          val lastId =
            if (sorted.isEmpty) s0.lastId
            else math.max(s0.lastId, sorted.last.id)
          sorted.foreach { r =>
            // the batch op's fit-test bound (Packing.maxTokBound):
            // past it `fill + tok` could wrap before any guard
            require(r.tok <= graft.ops.Packing.maxTokBound(capacity),
              s"tok ${r.tok} exceeds the Int64 fit-test bound at " +
                s"capacity $capacity")
            if (r.tok > capacity) nOver += 1L
            if (bins == 0L) { bins = 1L; fill = r.tok }
            else if (fill + r.tok <= capacity) fill += r.tok
            else { bins += 1L; fill = r.tok }
            nt += r.tok
            nd += 1L
          }
          state.update(NfState(nd, nt, bins, fill, nOver, lastId, ooo))
          if (sorted.nonEmpty) {
            // the batch op's loud eff_ppm overflow stance (JVM form)
            require(nt <= Long.MaxValue / 1000000L &&
              bins <= Long.MaxValue / capacity,
              s"packing eff_ppm would overflow Int64: tokens=$nt, " +
                s"bins=$bins, capacity=$capacity; split the shard")
            Iterator(NfRow(shard, nd, nt, bins, fill, nOver,
              nt * 1000000L / (bins * capacity), ooo))
          } else Iterator.empty
      }
  }

  def chunkPackStates(docs: DataFrame, idCol: String, tokensCol: String,
                      capacity: Long, nShards: Int): Dataset[PackRow] = {
    require(capacity >= 1L, s"capacity must be >= 1, got $capacity")
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards in [1, 2^20], got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(idCol).isNotNull && col(tokensCol).isNotNull &&
        col(tokensCol) >= 1L)
      .select(pmod(col(idCol).cast("long"), lit(nShards.toLong))
          .as("shard"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("tok"))
      .as[PackEvent]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[PackEvent],
         state: GroupState[PackState]) =>
          val sorted = rows.toArray.sortBy(_.id)
          val s0 = state.getOption.getOrElse(
            PackState(0L, 0L, 0L, Long.MinValue, 0L))
          var (nd, off, ns) = (s0.nDocs, s0.off, s0.nStraddling)
          // cross-batch order monitor (object doc): ids at or below
          // the carried high-water mark arrived too late to land at
          // the batch op's offset
          val ooo = s0.ooo + sorted.count(_.id <= s0.lastId).toLong
          val lastId =
            if (sorted.isEmpty) s0.lastId
            else math.max(s0.lastId, sorted.last.id)
          sorted.foreach { r =>
            // the carried offset grows without bound across the
            // stream's lifetime (ADVICE r12 follow-up): fail loudly
            // before `off + tok` can wrap Int64 — the batch op's
            // ANSI-mode prefix sum throws at the same point
            require(r.tok <= Long.MaxValue - off,
              s"shard token offset $off + ${r.tok} would overflow " +
                "Int64; re-shard or restart the packing epoch")
            val binFirst = off / capacity
            val binLast = (off + r.tok - 1L) / capacity
            if (binFirst != binLast) ns += 1L
            off += r.tok
            nd += 1L
          }
          state.update(PackState(nd, off, ns, lastId, ooo))
          if (sorted.nonEmpty)
            Iterator(PackRow(shard, nd, off,
              (off + capacity - 1L) / capacity, ns, ooo))
          else Iterator.empty
      }
  }
}
