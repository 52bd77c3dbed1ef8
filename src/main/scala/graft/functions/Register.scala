package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the graft custom expressions, so `spark.sql`
  * users get the same kernels as the Column API:
  *
  *   SELECT graft_dot(a, b), graft_simhash64(toks),
  *          graft_minhash_sig(shingles, 16),
  *          graft_parse_log_block(block)['amount'] ...
  */
object Register {
  def all(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue), "built-in")
    registry.createOrReplaceTempFunction("graft_parse_log_block",
      exprs => ParseLogBlock(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_mode",
      exprs => ModeAgg(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_heavy_hitters",
      exprs => MisraGriesAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue), "built-in")
    // graft_top_k(score, id, k) — the bounded mergeable ANN finisher:
    // per-group top-k (score desc, ties to smallest id) as an
    // aggregate, no per-group window funnel
    registry.createOrReplaceTempFunction("graft_top_k",
      exprs => TopKAgg(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue), "built-in")
  }
}
