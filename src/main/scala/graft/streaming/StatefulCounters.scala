package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The consumer's two process-global counters (`FD/consumer.py:18-20,
  * 127-131`) in their exact shape — explicit keyed state via
  * `mapGroupsWithState`, as the alternative to the `groupBy().count()`
  * aggregation in `Scorer.counters`.
  *
  * Why both: the aggregation form is what you want at scale (partial
  * aggregation, state store pruning); the `mapGroupsWithState` form is
  * the general tool for state the built-in aggregates cannot express
  * (per-key custom structs, conditional resets, timeouts). Keeping the
  * reference's counter in both shapes documents the trade.
  */
object StatefulCounters {

  case class CounterState(count: Long)
  case class CounterUpdate(label: String, count: Long)

  /** Per-label all-time counts with explicit state. Update mode: emits
    * one row per touched label per micro-batch.
    */
  def counters(scored: Dataset[org.apache.spark.sql.Row])
      : Dataset[CounterUpdate] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("prediction_label").as("label")).as[String]
      .groupByKey(identity)
      .mapGroupsWithState[CounterState, CounterUpdate](
        GroupStateTimeout.NoTimeout) {
        (label: String, rows: Iterator[String], state: GroupState[CounterState]) =>
          val prev = state.getOption.map(_.count).getOrElse(0L)
          val next = prev + rows.size
          state.update(CounterState(next))
          CounterUpdate(label, next)
      }
  }

  /** Convenience writer: counter updates → in-memory sink for tests /
    * dashboards (update mode — mapGroupsWithState's required mode).
    */
  def toMemorySink(updates: Dataset[CounterUpdate], name: String) =
    updates.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update)
}
