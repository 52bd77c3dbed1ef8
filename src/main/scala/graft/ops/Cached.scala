package graft.ops

import org.apache.spark.sql.DataFrame

/** A lazily-composable pipeline result plus the persisted intermediates
  * backing it. `df` is a plain DataFrame (compose/aggregate/join it
  * freely — the backing frames materialize at the consuming action);
  * call [[release]] AFTER that action to free the block-manager memory.
  * Long-lived sessions running many dedup/ANN jobs leak signature
  * frames without this — a policy note became this mechanism. Releasing
  * early is safe, not wrong: the plan stays valid and simply recomputes
  * if re-used.
  */
final case class Cached(df: DataFrame, backing: Seq[DataFrame]) {
  def release(): Unit = backing.foreach(_.unpersist(blocking = false))
}
