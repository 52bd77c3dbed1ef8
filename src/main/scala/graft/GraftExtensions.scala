package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHashSignature, ModeAgg, ParseLogBlock, SimHash64}

/** Deploy-time registration: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects the custom kernels into every session the cluster builds, so
  * SQL users get them without touching code. The in-session equivalent
  * is `graft.functions.Register.all(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit simhash of array<string>"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "minhash signature of array<string>"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue)))
    e.injectFunction((FunctionIdentifier("graft_parse_log_block"),
      info("graft_parse_log_block", "log block -> key/value map"),
      (exprs: Seq[Expression]) => ParseLogBlock(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_mode"),
      info("graft_mode", "single-pass mode with pandas tie-break"),
      (exprs: Seq[Expression]) => ModeAgg(exprs.head)))
    // plan-time safety interlock: unhinted cross joins fail loudly
    // when spark.graft.failOnCartesian=true (see plans.CartesianGuard)
    e.injectOptimizerRule(_ => graft.plans.CartesianGuard)
  }
}
