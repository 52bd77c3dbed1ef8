package graft.plans

import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst OPTIMIZER RULE — the 100-TB cartesian interlock.
  *
  * This engine's scale contract says every intentional cross join
  * carries a broadcast-small-side hint (one-row stats frames, bounded
  * ANN query sets); an UNHINTED cross join in a plan is a bug that
  * local[32] at sf0.1 will happily execute and a 1000-executor run
  * against 100 TB will not survive. With `spark.graft.failOnCartesian`
  * set to true, this rule makes that bug fail at PLAN time — loudly,
  * with the offending join printed — instead of as a cluster-wide
  * incident hours into the job.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`), so a
  * deploy enables it cluster-wide with two `--conf` flags and zero code
  * changes. The rule runs in the optimizer phase, after
  * `EliminateResolvedHint` has folded hints into the Join node, which
  * is what lets it distinguish the contract-compliant
  * `crossJoin(broadcast(tiny))` from the accidental all-pairs join.
  * It never rewrites the plan — inspect-and-throw only.
  */
object CartesianGuard extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.failOnCartesian"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false").toBoolean) {
      plan.foreach {
        case j: Join if isUnprotectedCross(j) =>
          throw new IllegalStateException(
            "graft cartesian interlock: cross join without a broadcast " +
              "hint on either side — at production scale this is an " +
              "all-pairs shuffle. broadcast() the small side (the graft " +
              "contract for intentional crosses), add the missing join " +
              s"condition, or unset $ConfKey. Join: " +
              j.simpleString(conf.maxToStringFields))
        case _ => ()
      }
    }
    plan
  }

  private def hintedBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  private def isUnprotectedCross(j: Join): Boolean = {
    val cross = j.joinType == Cross ||
      (j.joinType == Inner && j.condition.isEmpty)
    cross && !hintedBroadcast(j.hint.leftHint) &&
      !hintedBroadcast(j.hint.rightHint)
  }
}
