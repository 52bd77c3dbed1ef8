package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Misra–Gries heavy hitters as per-entity `flatMapGroupsWithState`
  * STATE — the frequency sibling of
  * [[StreamVelocity.kllQuantileStates]]: an Append-mode per-entity
  * top-items monitor ("which items dominate THIS key's stream"),
  * where st26 held the summary in a complete-mode aggregation buffer.
  * State per entity is ≤ k (item, count) pairs regardless of stream
  * length, and the Misra–Gries guarantee — every item with
  * c·(k+1) > n retained, estimate in [c − n/(k+1), c] — is
  * merge-order-free (Agarwal et al. 2012), so it holds across the
  * state store's batch boundaries and the gate booleans are
  * deterministic even though the retained SET depends on arrival
  * order (the a50/st26 stance).
  *
  * Update rule = [[graft.functions.HeavyHittersAgg]]'s exactly
  * (increment / insert-below-k / decrement-all), restated here over a
  * plain Map because the aggregate's buffer lifecycle is tied to the
  * expression tree; long items only (the state-store shape).
  */
object StreamSketch {

  case class ItemEvent(grp: String, item: Long)
  case class HhEntry(item: Long, est: Long)
  case class HhRow(grp: String, n: Long, hh: Seq[HhEntry])
  case class HhState(n: Long, items: Map[Long, Long])

  def hhStates(events: DataFrame, keyCol: String, itemCol: String,
               k: Int): Dataset[HhRow] = {
    require(k >= 1 && k <= 65536, s"k in [1, 65536], got $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col(keyCol).isNotNull && col(itemCol).isNotNull)
      .select(col(keyCol).cast("string").as("grp"),
        col(itemCol).cast("long").as("item"))
      .as[ItemEvent]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[HhState, HhRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[ItemEvent],
         state: GroupState[HhState]) =>
          val s0 = state.getOption.getOrElse(HhState(0L, Map.empty))
          val buf = mutable.HashMap.empty[Long, Long]
          buf ++= s0.items
          var n = s0.n
          var any = false
          rows.foreach { r =>
            any = true
            n += 1L
            buf.get(r.item) match {
              case Some(c) => buf(r.item) = c + 1L
              case None if buf.size < k => buf(r.item) = 1L
              case None =>
                // decrement-all; amortized O(1) per input over the run
                val dead = mutable.ArrayBuffer.empty[Long]
                buf.foreach { case (key, c) =>
                  if (c == 1L) dead += key else buf(key) = c - 1L
                }
                dead.foreach(buf.remove)
            }
          }
          state.update(HhState(n, buf.toMap))
          if (any) {
            val sorted = buf.toArray.sortWith { (x, y) =>
              if (x._2 != y._2) x._2 > y._2 else x._1 < y._1
            }
            Iterator(HhRow(grp, n,
              sorted.toSeq.map { case (i, c) => HhEntry(i, c) }))
          } else Iterator.empty
      }
  }
}
